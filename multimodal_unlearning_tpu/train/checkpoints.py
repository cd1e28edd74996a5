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
# Quantized checkpoints (offline quantizer output — cli/quantize_model.py)
#
# Beyond-reference deployment path: quantize ONCE offline, then every eval /
# serve / forget run loads the int8/int4 tree directly — no dense weights ever
# touch host RAM or HBM at load time (a 7B int4 checkpoint is ~3.4 GB on disk
# vs 13.5 GB bf16).  Native '/'-joined tree layout (like adapters), NOT the
# HF state-dict layout: QTensor leaves ({"q","s"} / {"q4","s"},
# utils/quantize.py) persist as `<key>/q[4]` + `<key>/s`; q4 leaves are
# already int8 nibble pairs so they save verbatim.  Legacy checkpoints that
# recorded jnp.int4 arrays (flat uint8 nibbles + int4_shapes metadata) are
# converted to the q4 layout at load time.
# ---------------------------------------------------------------------------

_QUANT_FILE = "model.quant.safetensors"
_QUANT_META = "quantize_meta.json"


def quantized_checkpoint_exists(path: str | Path) -> bool:
    return (Path(path) / _QUANT_FILE).exists()


def _legacy_int4_to_q4(packed: np.ndarray, shape) -> np.ndarray:
    """Legacy checkpoint format (flat uint8 nibbles of a jnp.int4 array) →
    the runtime q4 layout (int8 nibble pairs along the contracting dim)."""
    lo = packed & 0xF
    hi = packed >> 4
    vals = np.empty(packed.size * 2, np.int8)
    vals[0::2] = lo
    vals[1::2] = hi
    vals = np.where(vals > 7, vals - 16, vals).astype(np.int8)  # sign-extend
    vals = vals.reshape(shape)
    half = shape[-2] // 2  # half-split packing (see utils/quantize.py)
    lo2, hi2 = vals[..., :half, :], vals[..., half:, :]
    return ((lo2 & 0xF) | (hi2 << 4)).astype(np.int8)


def save_quantized_checkpoint(save_dir: str | Path, params: dict, meta: dict | None = None):
    from safetensors.numpy import save_file

    p = Path(save_dir)
    p.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {}
    for path, v in leaves:
        key = "/".join(str(k.key) for k in path)
        flat[key] = np.ascontiguousarray(np.asarray(v))
    save_file(flat, str(p / _QUANT_FILE))
    with open(p / _QUANT_META, "w") as f:
        json.dump(dict(meta or {}, int4_shapes={}), f, indent=2)


def load_quantized_checkpoint(path: str | Path, dtype=None):
    """Rebuild the native param tree: int q leaves stay int (int4 unpacked
    from nibbles), QTensor scales stay f32, plain float leaves cast to
    ``dtype``.  Returns (params, meta)."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    p = Path(path)
    with open(p / _QUANT_META) as f:
        meta = json.load(f)
    int4_shapes = meta.get("int4_shapes", {})
    flat = load_file(str(p / _QUANT_FILE))
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        if key in int4_shapes:  # legacy jnp.int4 checkpoint → q4 layout
            arr = jax.numpy.asarray(_legacy_int4_to_q4(val, int4_shapes[key]))
            parts[-1] = "q4"
        else:
            arr = jax.numpy.asarray(val)
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr

    if dtype is not None:
        from multimodal_unlearning_tpu.utils.quantize import is_qtensor

        def cast(node):
            if is_qtensor(node):
                return node  # q stays int, s stays f32
            if isinstance(node, dict):
                return {k: cast(v) for k, v in node.items()}
            return node.astype(dtype) if jnp.issubdtype(node.dtype, jnp.floating) else node

        tree = cast(tree)
    return tree, meta


# ---------------------------------------------------------------------------
# Training-state resume (Orbax)
# ---------------------------------------------------------------------------


def save_train_state(ckpt_dir: str | Path, step: int, state) -> None:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


class TrainStateCheckpointer:
    """Async train-state checkpointing with retention.

    The device->host snapshot is the only synchronous part (obligatory:
    the train step DONATES the state, so its buffers are invalid the
    moment the next step dispatches); the Orbax write + old-step pruning
    run on a background thread, overlapping training.  The reference
    inherits HF Trainer's fully synchronous ``_save_checkpoint``
    (save_total_limit pruning included) — this is the overlap-friendly
    equivalent.

    Args:
      ckpt_dir: directory of ``step_N`` checkpoints.
      async_save: False = block until the write finishes (old behavior).
      keep_last: prune to the newest N step dirs after each save (0/None
        keeps everything); the latest step is never pruned, so resume is
        unaffected.
    """

    def __init__(self, ckpt_dir: str | Path, *, async_save: bool = True,
                 keep_last: int | None = None):
        self.dir = Path(ckpt_dir).resolve()
        self.async_save = async_save
        self.keep_last = int(keep_last or 0)
        self._thread = None
        self._error = None

    def _write(self, step: int, host_state):
        import orbax.checkpoint as ocp

        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(self.dir / f"step_{step}", host_state, force=True)
            ckptr.wait_until_finished()
            if self.keep_last > 0:
                steps = sorted(_finalized_steps(self.dir))
                for old in steps[: -self.keep_last]:
                    import shutil

                    shutil.rmtree(self.dir / f"step_{old}", ignore_errors=True)
        except Exception as e:  # surfaced on the next save()/wait()
            self._error = e

    def save(self, step: int, state) -> None:
        # drain the in-flight write FIRST: snapshotting before waiting would
        # hold two full host-side train states at once (at 7B that is
        # O(100 GB) transient host RAM)
        self.wait()
        host_state = jax.tree.map(np.asarray, state)  # sync d2h snapshot
        if self.async_save:
            import threading

            self._thread = threading.Thread(
                target=self._write, args=(step, host_state), daemon=True)
            self._thread.start()
        else:
            self._write(step, host_state)
            self._raise_pending()

    def wait(self) -> None:
        """Block until the in-flight write (if any) lands; re-raise its
        error in the training thread."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        self._raise_pending()

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(f"async checkpoint write failed: {err}") from err


def _finalized_steps(p: Path) -> list[int]:
    """step_N dirs, EXCLUDING Orbax tmp dirs from an interrupted save
    (``step_N.orbax-checkpoint-tmp-*`` would otherwise crash int())."""
    out = []
    for d in p.glob("step_*"):
        if not d.is_dir():
            continue
        tail = d.name.split("_", 1)[1]
        if tail.isdigit():
            out.append(int(tail))
    return out


def latest_train_state_step(ckpt_dir: str | Path) -> int | None:
    p = Path(ckpt_dir)
    if not p.exists():
        return None
    steps = _finalized_steps(p)
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str | Path, step: int, template):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
