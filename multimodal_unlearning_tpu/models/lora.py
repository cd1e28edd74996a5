"""LoRA adapters over stacked-layer param trees.

Reference behavior: peft LoRA on every linear except lm_head
(utils.py:10-19, mm/finetune.py:91-101), r/alpha/dropout from config,
merge_and_unload before saving (mm/finetune.py:129-133).

Here the adapter tree mirrors the decoder's stacked layout — each target
projection gets ``a: [L, in, r]`` (gaussian) and ``b: [L, r, out]`` (zeros) —
and is applied inside the matmul (models/llama.py:dense).  ``merge`` folds
adapters into the dense weights for checkpoint export.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

# every decoder linear except lm_head (reference drops lm_head: utils.py:16-17)
DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def lora_scale(r: int, alpha: float) -> float:
    return alpha / r if r else 0.0


def init_lora(layer_params: dict, r: int, key, targets=DEFAULT_TARGETS, dtype=jnp.float32) -> dict:
    """Build adapters for the stacked ``layers`` subtree of a decoder."""
    adapters = {}
    keys = iter(jax.random.split(key, len(targets)))
    for name in targets:
        w = layer_params.get(name)
        if w is None:
            continue
        q4 = isinstance(w, dict) and "q4" in w
        if isinstance(w, dict):  # int8/int4 QTensor base (QLoRA)
            w = w["q4"] if q4 else w["q"]
        if w.ndim != 3:
            # MoE expert stacks [L,E,in,out] are not LoRA targets: top-k
            # routing shows each expert ~k/E of the tokens, so the
            # unlearning signal concentrates in the (adapted) attention
            # projections; the router stays frozen (no reference analog)
            continue
        L, d_in, d_out = w.shape
        if q4:  # nibble-packed contracting dim: physical in/2
            d_in *= 2
        adapters[name] = {
            "a": (jax.random.normal(next(keys), (L, d_in, r)) * d_in**-0.5).astype(dtype),
            "b": jnp.zeros((L, r, d_out), dtype),
        }
    return {"layers": adapters}


# the reference's find_all_linear_names also catches the VLM projector
# (multi_modal_projector.linear_1/linear_2 / the Qwen merger MLP) — every
# linear except lm_head gets an adapter (utils.py:10-19, mm/finetune.py:91-101)
PROJECTOR_TARGETS = ("fc1", "fc2")


def init_flat_lora(flat_params: dict, r: int, key, targets=PROJECTOR_TARGETS, dtype=jnp.float32) -> dict:
    """Adapters for unstacked 2-D linears (the VLM projector/merger MLP)."""
    adapters = {}
    keys = iter(jax.random.split(key, len(targets)))
    for name in targets:
        w = flat_params[name]
        q4 = isinstance(w, dict) and "q4" in w
        if isinstance(w, dict):
            w = w["q4"] if q4 else w["q"]
        d_in, d_out = w.shape
        if q4:  # nibble-packed contracting dim: physical in/2
            d_in *= 2
        adapters[name] = {
            "a": (jax.random.normal(next(keys), (d_in, r)) * d_in**-0.5).astype(dtype),
            "b": jnp.zeros((r, d_out), dtype),
        }
    return adapters


def _projector_site(params: dict):
    """Locate the projector subtree: LLaVA keeps it at params['projector'],
    Qwen2-VL inside the tower as params['vision_tower']['merger']."""
    if "projector" in params:
        return ("projector",)
    vt = params.get("vision_tower")
    if isinstance(vt, dict) and "merger" in vt:
        return ("vision_tower", "merger")
    return None


def init_model_lora(params: dict, r: int, key, *, projector: bool = True, dtype=jnp.float32) -> dict:
    """Full-model adapter tree (reference: every linear except lm_head).

    Decoder-only params get the stacked layer adapters; VLM params (with a
    'language_model' subtree) additionally get projector/merger adapters under
    the 'projector' key unless ``projector=False``."""
    if "language_model" not in params:
        return init_lora(params["layers"], r, key, dtype=dtype)
    k1, k2 = jax.random.split(key)
    adapters = {"language_model": init_lora(params["language_model"]["layers"], r, k1, dtype=dtype)}
    site = _projector_site(params) if projector else None
    if site is not None:
        node = params
        for k in site:
            node = node[k]
        adapters["projector"] = init_flat_lora(node, r, k2, dtype=dtype)
    return adapters


def stack_adapters(trees: list, scales: list) -> dict:
    """Stack same-structure adapter trees into ONE multi-adapter bank for
    per-row serving (models/llama.py:apply_lora_delta with ``lora_ids``;
    apply with ``lora_scale=1.0`` — each adapter's own alpha/r scale is
    folded into its ``b`` here).

    Decoder layer leaves [L,in,r] stack to [L,A,in,r] (axis 1: the layer
    scan still slices L); flat projector leaves [in,r] stack to [A,in,r]."""
    scaled = [
        jax.tree_util.tree_map_with_path(
            lambda p, x, s=s: x * s if p[-1].key == "b" else x, t)
        for t, s in zip(trees, scales)
    ]
    return jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=1 if xs[0].ndim == 3 else 0), *scaled)


def merge_flat(flat_params: dict, lora: dict, scale: float) -> dict:
    """Fold flat (2-D) adapters into their dense weights."""
    out = dict(flat_params)
    for name, ab in lora.items():
        w = out[name]
        # promote, never demote: bf16 adapters fold in f32, f64 stays f64
        acc = jnp.promote_types(ab["a"].dtype, jnp.float32)
        delta = ab["a"].astype(acc) @ ab["b"].astype(acc)
        out[name] = (w.astype(acc) + scale * delta).astype(w.dtype)
    return out


def merge_model(params: dict, adapters: dict, scale: float,
                consume: bool = False, out_dtype=None) -> dict:
    """Model-level merge_and_unload: decoder layers + projector adapters."""
    if "language_model" not in adapters:
        return merge(params, adapters, scale, consume=consume,
                     out_dtype=out_dtype)
    out = dict(params, language_model=merge(
        params["language_model"], adapters["language_model"], scale,
        consume=consume, out_dtype=out_dtype))
    proj = adapters.get("projector")
    if proj:
        site = _projector_site(out)
        if site == ("projector",):
            out["projector"] = merge_flat(out["projector"], proj, scale)
        elif site is not None:
            vt = dict(out["vision_tower"])
            vt["merger"] = merge_flat(vt["merger"], proj, scale)
            out["vision_tower"] = vt
    return out


def merge(params: dict, lora: dict, scale: float, consume: bool = False,
          out_dtype=None) -> dict:
    """merge_and_unload analog: fold adapters into dense weights.

    Handles an int8-quantized (QLoRA) base: QTensor leaves are dequantized to
    bf16 before folding, and the whole returned tree is dense (saveable) —
    reference merges via peft then saves dense (mm/forget.py:110-115).

    ``consume=True`` streams the merge one leaf at a time and DELETES each
    source buffer (the QTensor's device arrays) before touching the next.
    The default path holds the int8 tree AND its full dense copy alive at
    once — 6.7 + 13.5 GB at 7B, which OOMs a 16 GB v5e at the end-of-run
    merge (observed in examples/e2e_7b_pipeline.py's finetune stage); the
    streaming path peaks at dense-so-far + int8-remainder ≤ the dense tree
    plus one leaf.  Leaves are bit-identical to the default path (same
    dequant→promote→fold→demote order, fused in one jitted program per
    leaf).  Use only at end-of-run merges: the input tree is unusable after.
    """
    from multimodal_unlearning_tpu.utils.quantize import is_qtensor

    # default: the adapters' dtype (f32 LoRA ⇒ f32 checkpoint — the
    # historical behavior every exactness test pins).  ``out_dtype``
    # overrides it: an f32-LoRA 7B otherwise merges to a 28 GB f32
    # checkpoint, doubling every save/load (merge_dtype: bfloat16 in the
    # train CLIs).
    lead = next(iter(lora.get("layers", {}).values()), None)
    dq_dtype = out_dtype or (lead["b"].dtype if lead is not None else jnp.bfloat16)
    lora_layers = lora.get("layers", {})

    # both paths run the SAME jitted per-leaf programs, so consume=True is
    # bit-identical to the default (round-4 lesson: an eager twin drifts by
    # 1 ulp and every exactness test downstream breaks).  Only QTensor
    # sources are deleted: they are the memory hogs, and dense leaves may be
    # shared with other live trees (quantize_tree passes small leaves
    # through by reference).  consume additionally moves each merged leaf to
    # HOST memory as it lands — the consume path's one consumer is
    # save_model, so the device never holds the dense tree at all (holding
    # it peaked over 16 GB at 7B even with streaming: second observed OOM
    # in examples/e2e_7b_pipeline.py).
    def finish(src, out):
        if consume:
            host = jax.device_get(out)
            out.delete()
            if is_qtensor(src):
                _delete_leaf(src)
            return host
        return out

    def dq_walk(node):
        if is_qtensor(node):
            return finish(node, _dq_leaf_jit(node, dq_dtype))
        if isinstance(node, dict):
            return {k: dq_walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            raise TypeError(
                "merge traverses dicts only; found a "
                f"{type(node).__name__} container")
        return node

    merged = {}
    for key, sub in params.items():
        if key != "layers":
            merged[key] = dq_walk(sub)
            continue
        merged_layers = {}
        for name, w in sub.items():
            ab = lora_layers.get(name)
            if ab is None:
                merged_layers[name] = dq_walk(w)
            else:
                merged_layers[name] = finish(w, _fold_leaf_jit(
                    w, ab["a"], ab["b"], float(scale), dq_dtype, is_qtensor(w)))
        merged["layers"] = merged_layers
    return merged


def _delete_leaf(node):
    for v in jax.tree.leaves(node):
        if isinstance(v, jax.Array):
            v.delete()


@_functools.partial(jax.jit, static_argnames=("dtype",))
def _dq_leaf_jit(qt, dtype):
    from multimodal_unlearning_tpu.utils.quantize import dequantize_leaf

    return dequantize_leaf(qt, dtype)


@_functools.partial(jax.jit, static_argnames=("scale", "dtype", "quantized"))
def _fold_leaf_jit(w, a, b, scale, dtype, quantized):
    """One merged layer leaf: matches the default path's numerics exactly —
    dequantize to ``dtype`` first, THEN promote and fold.  The fold runs as
    a ``lax.map`` over the stacked layer dim so the f32 delta transient is
    one layer (~180 MB at 7B), not the whole [L, in, out] stack (5.8 GB —
    the stack-wide einsum OOMed the 7B end-of-run merge)."""
    from multimodal_unlearning_tpu.utils.quantize import dequantize_leaf

    acc = jnp.promote_types(a.dtype, jnp.float32)
    out_dtype = dtype if quantized else w.dtype

    def per_layer(args):
        wl, al, bl = args
        if quantized:
            wl = dequantize_leaf(wl, dtype)
        delta = al.astype(acc) @ bl.astype(acc)
        return (wl.astype(acc) + scale * delta).astype(out_dtype)

    return jax.lax.map(per_layer, (w, a, b))
