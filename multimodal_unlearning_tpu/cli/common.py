"""Shared CLI plumbing: model/processor construction, checkpoint IO, mesh."""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.data import ByteTokenizer, MMProcessor, load_tokenizer
from multimodal_unlearning_tpu.models import hf_bridge, llama, llava
from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh
from multimodal_unlearning_tpu.train import checkpoints


def maybe_init_distributed() -> int:
    """Multi-host wiring over DCN (jax.distributed).

    The reference reads WORLD_SIZE/LOCAL_RANK from accelerate's env
    (mm/forget.py:23-31); the TPU analog is coordinator-based process init.
    Set MMU_COORDINATOR=host:port, MMU_NUM_PROCESSES, MMU_PROCESS_ID (or rely
    on TPU pod metadata where available).  No-op single-process otherwise.
    Returns jax.process_index().
    """
    import os

    coord = os.environ.get("MMU_COORDINATOR")
    if coord:
        # must run before anything initializes the XLA backend (including
        # jax.process_count/jax.devices)
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["MMU_NUM_PROCESSES"]),
                process_id=int(os.environ["MMU_PROCESS_ID"]),
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index()


def rank_suffix() -> str:
    """Per-rank artifact suffix when multi-process (nlp/evaluate_util.py:431-434)."""
    return f"_rank{jax.process_index()}" if jax.process_count() > 1 else ""


def max_grad_norm_of(cfg, forget_loss: str | None = None) -> float | None:
    """The HF TrainingArguments default max_grad_norm=1.0 applies to every
    reference run — the yaml override is commented out (config/mm/forget.yaml:39,
    mm/forget.py:151).  ``max_grad_norm: null`` (or 0) disables.  EXCEPTION:
    the grad-projection trainer never effectively clips — the vendored loop
    clips param.grad (nlp/grad_proj.py:447-461) and then the projection
    OVERWRITES it from the unclipped accumulated grads (:483-491), so the
    stepped direction is unclipped."""
    if forget_loss and str(forget_loss).startswith("grad_proj"):
        return None
    v = cfg.get("max_grad_norm", 1.0)
    return float(v) if v else None


def dtype_of(cfg) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(cfg.get("dtype", "bfloat16"))
    ]


def parse_dtype(name):
    """None-preserving dtype parse for optional keys (e.g. ``merge_dtype``:
    a 7B f32-LoRA merge otherwise writes a 28 GB f32 checkpoint)."""
    if name is None or not isinstance(name, str):
        return name
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def build_mesh(cfg):
    return make_mesh(MeshSpec.from_config(cfg.get("mesh")))


def model_kind(model_cfg) -> str:
    arch = model_cfg["arch"]
    return str(arch["kind"]) if "kind" in arch and arch["kind"] else "llama"


def is_vlm(kind: str) -> bool:
    from multimodal_unlearning_tpu.models import VLM_KINDS

    return kind in VLM_KINDS


def quantize_base_params(params, kind, spec):
    """Quantize the decoder weights per the ``quantize_base`` config value:
    true/"int8" → per-output-channel int8 (W8A16, or W8A8 under
    ``int8_compute``); "int4" → grouped W4A16 (utils/quantize.py) — half the
    int8 weight stream again, the memory lever for long-context / big-batch
    decode.  VLMs quantize only the language tower (vision+projector stay
    float, matching the int8 path).  A tree that is ALREADY quantized (loaded
    from a cli/quantize_model.py checkpoint) passes through untouched.

    DESTRUCTIVE: quantizes leaf by leaf, deleting each float buffer as it
    goes (quantize_tree_inplace) — a whole-tree quantize holds bf16
    (13.5 GB at 7B) + int8 (6.7 GB) alive at once and OOMs a 16 GB chip.
    Callers own ``params`` and reassign the return value; the float leaves
    are dead afterwards."""
    from multimodal_unlearning_tpu.utils.quantize import (
        is_qtensor, quantize_tree_inplace)

    if any(is_qtensor(x) for x in jax.tree.leaves(params, is_leaf=is_qtensor)):
        return params  # pre-quantized checkpoint — nothing to do

    s = str(spec).strip().lower()
    # "int4" (group 128) or "int4:g<N>" — smaller groups buy quantization
    # accuracy at the cost of more scale traffic (the gate's group sweep)
    bits = 4 if s.startswith("int4") else 8
    gs = int(s.split(":g", 1)[1]) if bits == 4 and ":g" in s else 128
    qt = lambda p: quantize_tree_inplace(p, bits=bits, group_size=gs)
    return (
        dict(params, language_model=qt(params["language_model"]))
        if is_vlm(kind) else qt(params)
    )


def build_model_config(model_cfg):
    from multimodal_unlearning_tpu.models import decoder_config, qwen2_vl

    arch = model_cfg["arch"]
    kind = model_kind(model_cfg)
    if kind == "llava":
        return llava.LlavaConfig.from_registry(arch)
    if kind == "qwen2_vl":
        return qwen2_vl.QwenVLConfig.from_registry(arch)
    return decoder_config(arch)


def _decoder_from_hf(sd, arch, mcfg):
    """HF state dict → our stacked decoder tree, per registry family."""
    name = str(arch.get("decoder", "llama"))
    if name == "neox":
        return hf_bridge.neox_from_hf(sd, mcfg.num_layers, mcfg.num_heads)
    if name == "phi":
        return hf_bridge.phi_from_hf(sd, mcfg.num_layers)
    if name == "stablelm":
        return hf_bridge.stablelm_from_hf(sd, mcfg.num_layers)
    return hf_bridge.llama_from_hf(
        sd, mcfg.num_layers, qkv_bias=getattr(mcfg, "qkv_bias", False),
        num_experts=getattr(mcfg, "num_experts", 0),
    )


def _decoder_to_hf(params, arch, mcfg):
    name = str(arch.get("decoder", "llama"))
    if name == "neox":
        return hf_bridge.neox_to_hf(params, mcfg.num_heads)
    if name == "phi":
        return hf_bridge.phi_to_hf(params)
    if name == "stablelm":
        return hf_bridge.stablelm_to_hf(params)
    return hf_bridge.llama_to_hf(params)


def init_or_load_params(model_cfg, model_path: str | None, seed: int = 0, dtype=jnp.float32):
    """Load HF-layout safetensors from model_path if present; else random init
    (zero-egress dev mode — reference would download from the hub here,
    mm/forget.py:79-115)."""
    kind = model_kind(model_cfg)
    mcfg = build_model_config(model_cfg)
    if model_path and checkpoints.quantized_checkpoint_exists(model_path):
        # offline-quantized checkpoint (cli/quantize_model.py): int8/int4
        # QTensor leaves load directly — no dense weights ever materialize
        params, meta = checkpoints.load_quantized_checkpoint(model_path, dtype)
        print(f"Loaded quantized checkpoint ({meta.get('bits', 'int8')}) from {model_path}")
        return kind, mcfg, params
    if model_path and checkpoints.model_checkpoint_exists(model_path):
        # 3-attempt load retry (nlp/evaluate_util.py:363-395)
        last_err = None
        for attempt in range(3):
            try:
                sd = checkpoints.load_hf_checkpoint(model_path)
                break
            except Exception as e:  # transient FS/NFS errors
                last_err = e
                print(f"checkpoint load attempt {attempt + 1} failed: {e}")
        else:
            raise last_err
        if kind == "llava":
            params = hf_bridge.llava_from_hf(
                sd, mcfg.decoder.num_layers, mcfg.vision.num_layers
            )
        elif kind == "qwen2_vl":
            params = hf_bridge.qwen2vl_from_hf(
                sd, mcfg.decoder.num_layers, mcfg.vision.depth
            )
        else:
            params = _decoder_from_hf(sd, model_cfg["arch"], mcfg)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        print(f"Loaded checkpoint from {model_path}")
    else:
        from multimodal_unlearning_tpu.models import decoder_module, vlm_module

        init = vlm_module(kind).init_params if is_vlm(kind) else decoder_module(mcfg).init_params
        params = init(mcfg, jax.random.PRNGKey(seed), dtype=dtype)
        if model_path:
            print(f"No checkpoint at {model_path}; using random init (zero-egress mode)")
    return kind, mcfg, params


def save_model(save_dir, model_cfg, params, processor=None):
    if jax.process_index() != 0:  # one writer per multi-host job
        return
    kind = model_kind(model_cfg)
    mcfg = build_model_config(model_cfg)
    if kind == "llava":
        sd = hf_bridge.llava_to_hf(params, mcfg.vision.patch_size)
    elif kind == "qwen2_vl":
        sd = hf_bridge.qwen2vl_to_hf(params)
    else:
        sd = _decoder_to_hf(params, model_cfg["arch"], mcfg)
    checkpoints.save_hf_checkpoint(
        save_dir, sd, config={"model_family_arch": model_cfg["arch"].to_dict() if hasattr(model_cfg["arch"], "to_dict") else dict(model_cfg["arch"])}
    )


def build_processor(model_cfg, cfg, *, padding_side="left"):
    arch = model_cfg["arch"]
    kind = model_kind(model_cfg)
    if is_vlm(kind):
        vision = arch["vision"]
        image_size = int(vision["image_size"])
        if kind == "qwen2_vl":
            mcfg = build_model_config(model_cfg)
            n_img = mcfg.num_image_tokens  # merged tokens at the op point
            vision_mode = "qwen2vl"
            vision_wrap = (
                int(arch["vision_start_token_id"]), int(arch["vision_end_token_id"])
            )
            patch_size = int(vision.get("patch_size", 14))
            merge = int(vision.get("spatial_merge_size", 2))
        else:
            n_img = (image_size // int(vision["patch_size"])) ** 2
            vision_mode, vision_wrap = "clip", None
            patch_size, merge = int(vision["patch_size"]), 1
        tok_path = cfg.get("processor_path") or cfg.get("tokenizer_path")
        if tok_path and Path(str(tok_path)).exists() and any(Path(str(tok_path)).glob("tokenizer*")):
            tok = load_tokenizer(tok_path, image_token=arch.get("image_token", "<image>"))
        else:
            tok = ByteTokenizer(
                vocab_size=int(arch["decoder"]["vocab_size"]),
                image_token=arch.get("image_token", "<image>"),
                image_token_id=int(arch["image_token_id"]),
            )
        return MMProcessor(
            tok,
            image_size=image_size,
            num_image_tokens=n_img,
            chat_template=model_cfg.get("chat_template", "llava"),
            padding_side=padding_side,
            vision_mode=vision_mode,
            vision_wrap=vision_wrap,
            patch_size=patch_size,
            spatial_merge_size=merge,
        )
    # text-only families
    tok_path = cfg.get("tokenizer_path")
    if tok_path and Path(str(tok_path)).exists():
        tok = load_tokenizer(tok_path)
    else:
        tok = ByteTokenizer(vocab_size=int(arch["vocab_size"]), image_token_id=int(arch["vocab_size"]) - 1)
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    return MMProcessor(tok, chat_template="__tags__", tags=tags, padding_side=padding_side, image_size=32, num_image_tokens=0)


def num_data_devices(mesh) -> int:
    return mesh.shape["data"] * mesh.shape["fsdp"]


def make_tail_padder(batch_size: int):
    """Tail-batch padding shared by the eval CLIs.

    A short tail batch would recompile EVERY jitted program for the one-off
    [B_tail, ...] shape (minutes through the AOT helper), so tails are padded
    (last row repeated) up to the loader batch size — or to the perturb batch
    size ``batch_size // 4`` when the tail is at least that small.  Callers
    slice outputs back to the true row count.

    Batches LARGER than ``batch_size`` also pass through here: the flattened
    perturb batch is ``(batch_size // 4) × num_perturbed`` rows (mm/eval.py's
    ``bsz * num_seq``), which exceeds ``batch_size`` whenever there are more
    than 4 perturbed answers per sample (CLEAR/TOFU ship 5).  Those round up
    to the next multiple of the small batch — a steady shape per loader, so
    the jit-shape set stays bounded — never down (a downward target used to
    feed ``np.repeat`` a negative count).

    Returns ``(pad_rows, target)`` where ``pad_rows(a, to)`` pads array ``a``
    (None passes through) and ``target(B)`` picks the padded size for a
    tail of ``B`` rows.
    """
    import numpy as np

    small = max(batch_size // 4, 1)

    def pad_rows(a, to):
        if a is None or len(a) == to:
            return a
        return np.concatenate([a, np.repeat(a[-1:], to - len(a), axis=0)])

    def target(B):
        if B <= small:
            return small
        if B <= batch_size:
            return batch_size
        return -(-B // small) * small

    return pad_rows, target


def pad_width(a, multiple: int, fill):
    """Pad a [B, W] array's width up to a multiple (bounds the jit-shape set
    for per-batch variable-width side inputs like draft_ref)."""
    import numpy as np

    W = a.shape[1]
    Wp = -(-W // multiple) * multiple
    if Wp == W:
        return a
    return np.concatenate(
        [a, np.full((a.shape[0], Wp - W), fill, a.dtype)], axis=1)


def _has_qtensor(tree) -> bool:
    if isinstance(tree, dict):
        if set(tree.keys()) == {"q", "s"}:
            return True
        return any(_has_qtensor(v) for v in tree.values())
    return False


def apply_tensor_parallel(mesh, dec_cfg, kind, *trees):
    """Megatron-style TP over the 'tensor' mesh axis for every decoder copy
    in ``trees`` (student/frozen/teacher params).  No-op when tensor==1.
    int8-quantized (QTensor) trees keep their fsdp placement — TP composes
    with the bf16 path.  Returns the trees in input order."""
    tp = mesh.shape["tensor"]
    if tp <= 1:
        return trees if len(trees) != 1 else trees[0]
    from multimodal_unlearning_tpu.parallel.tp import tp_degree_ok, tp_shard_decoder

    if not tp_degree_ok(dec_cfg, tp):
        raise ValueError(f"tensor={tp} does not divide the decoder dims")
    lm_key = "language_model" if is_vlm(kind) else None

    def place(tree):
        if tree is None or not isinstance(tree, dict) or _has_qtensor(tree):
            return tree
        if lm_key is not None:
            lm = tree.get(lm_key)
            if isinstance(lm, dict) and "layers" in lm:
                return dict(tree, **{lm_key: tp_shard_decoder(lm, mesh)})
            return tree
        if "layers" in tree:
            return tp_shard_decoder(tree, mesh)
        return tree

    out = tuple(place(t) for t in trees)
    return out if len(out) != 1 else out[0]


def apply_expert_parallel(mesh, dec_cfg, kind, *trees):
    """Expert parallelism over the 'expert' mesh axis for every decoder copy
    in ``trees`` (parallel/ep.py): the MoE expert stacks [L,E,in,out] — bf16
    or int8 QTensor — are placed with E over the axis; GSPMD partitions the
    dispatch/FFN/combine einsums.  No-op when expert==1.  Composes with
    data/fsdp and with TP on the attention projections (different leaves)."""
    ep = mesh.shape.get("expert", 1)
    if ep <= 1:
        return trees if len(trees) != 1 else trees[0]
    n_experts = int(getattr(dec_cfg, "num_experts", 0))
    if not n_experts:
        raise ValueError(f"expert={ep} on a dense (non-MoE) decoder")
    if n_experts % ep != 0:
        raise ValueError(f"expert={ep} does not divide num_experts={n_experts}")
    from multimodal_unlearning_tpu.parallel.ep import ep_shard_decoder

    lm_key = "language_model" if is_vlm(kind) else None

    def place(tree):
        if tree is None or not isinstance(tree, dict):
            return tree
        if lm_key is not None:
            lm = tree.get(lm_key)
            if isinstance(lm, dict) and "layers" in lm:
                return dict(tree, **{lm_key: ep_shard_decoder(lm, mesh)})
            return tree
        if "layers" in tree:
            return ep_shard_decoder(tree, mesh)
        return tree

    out = tuple(place(t) for t in trees)
    return out if len(out) != 1 else out[0]


def apply_pipeline_parallel(mesh, dec_cfg, kind, *trees):
    """GPipe pipeline placement over the 'pipe' mesh axis for every decoder
    copy in ``trees`` (student/frozen/teacher params, bf16 or int8 QTensor —
    QTensor leaves keep their leading layer dim, so stage placement applies
    unchanged).  No-op when pipe==1.  Mutually exclusive with decoder TP:
    inside the pipeline's shard_map region Megatron all-reduces would need
    hand-written collectives (parallel/pp.py header)."""
    pipe = mesh.shape["pipe"]
    if pipe <= 1:
        return trees if len(trees) != 1 else trees[0]
    if mesh.shape["tensor"] > 1:
        raise ValueError("pipe>1 and tensor>1 cannot both shard the decoder")
    if dec_cfg.num_layers % pipe != 0:
        raise ValueError(f"pipe={pipe} does not divide num_layers={dec_cfg.num_layers}")
    from multimodal_unlearning_tpu.parallel.pp import pp_shard_decoder

    lm_key = "language_model" if is_vlm(kind) else None

    def place(tree):
        if tree is None or not isinstance(tree, dict):
            return tree
        if lm_key is not None:
            lm = tree.get(lm_key)
            if isinstance(lm, dict) and "layers" in lm:
                return dict(tree, **{lm_key: pp_shard_decoder(lm, mesh)})
            return tree
        if "layers" in tree:
            return pp_shard_decoder(tree, mesh)
        return tree

    out = tuple(place(t) for t in trees)
    return out if len(out) != 1 else out[0]
