"""Checkpointing: HF-compatible safetensors export/import + Orbax resume.

Reference behavior to match (SURVEY.md §5 checkpoint/resume):
- final models saved dense in HF layout (safetensors + config) so published
  numbers reproduce (mm/forget.py:110-115, mm/finetune.py:129-133);
- checkpoint detection probes for ``pytorch*.bin`` / ``model*.safetensors``
  (mm/forget.py:73-75);
- training-state resume (step, optimizer moments, RNG) — HF Trainer's
  vendored loop in the reference (nlp/grad_proj.py:271-321); here Orbax.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import jax
import numpy as np


def model_checkpoint_exists(path: str | Path) -> bool:
    """mm/forget.py:73-75 probe."""
    p = Path(path)
    if not p.exists():
        return False
    return any(
        re.search(r"pytorch.*\.bin", f.name) or re.search(r"model.*\.safetensors", f.name)
        for f in p.glob("*")
    )


def save_hf_checkpoint(save_dir: str | Path, state_dict: dict, config: dict | None = None):
    """Write HF-layout safetensors + config.json."""
    from safetensors.numpy import save_file

    p = Path(save_dir)
    p.mkdir(parents=True, exist_ok=True)
    flat = {k: np.ascontiguousarray(np.asarray(v)) for k, v in state_dict.items()}
    save_file(flat, str(p / "model.safetensors"))
    if config is not None:
        with open(p / "config.json", "w") as f:
            json.dump(config, f, indent=2)


def load_hf_checkpoint(path: str | Path) -> dict:
    """Read all model*.safetensors shards in a dir into one state dict."""
    from safetensors.numpy import load_file

    p = Path(path)
    shards = sorted(p.glob("model*.safetensors")) or sorted(p.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"No safetensors checkpoint under {p}")
    sd = {}
    for shard in shards:
        sd.update(load_file(str(shard)))
    return sd


def save_adapter(save_dir: str | Path, adapters: dict, scale: float, meta: dict | None = None):
    """Save a RAW LoRA adapter tree (adapter.safetensors, '/'-joined keys,
    + adapter_meta.json carrying the alpha/r scale).

    The reference only ships merged checkpoints (peft merge_and_unload at
    mm/finetune.py:129-133); raw adapters additionally enable multi-LoRA
    serving — all sweep variants through ONE engine (serve/engine.py)."""
    from safetensors.numpy import save_file

    p = Path(save_dir)
    p.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(adapters)[0]
    flat = {
        "/".join(str(k.key) for k in path): np.ascontiguousarray(np.asarray(v))
        for path, v in leaves
    }
    save_file(flat, str(p / "adapter.safetensors"))
    with open(p / "adapter_meta.json", "w") as f:
        json.dump(dict(meta or {}, scale=float(scale)), f, indent=2)


def load_adapter(path: str | Path):
    """Load (adapter_tree, scale) saved by save_adapter."""
    from safetensors.numpy import load_file

    p = Path(path)
    flat = load_file(str(p / "adapter.safetensors"))
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jax.numpy.asarray(val)
    with open(p / "adapter_meta.json") as f:
        meta = json.load(f)
    return tree, float(meta["scale"])


# ---------------------------------------------------------------------------
# Training-state resume (Orbax)
# ---------------------------------------------------------------------------


def save_train_state(ckpt_dir: str | Path, step: int, state) -> None:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def latest_train_state_step(ckpt_dir: str | Path) -> int | None:
    p = Path(ckpt_dir)
    if not p.exists():
        return None
    steps = [int(d.name.split("_")[1]) for d in p.glob("step_*") if d.is_dir()]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str | Path, step: int, template):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
