"""Int8 weight quantization for frozen param trees (QLoRA-style).

The reference holds student + teacher in bf16 and needs DeepSpeed sharding
across GPUs for 7B teachers (mm/trainer.py:130-162).  Here frozen trees
(teacher; LoRA base) can be stored int8 with per-output-channel scales and
dequantized layer-by-layer inside the scanned forward — 2× HBM saving, which
is what lets a 7B student + 7B teacher co-reside on one 16GB v5e chip.

A quantized leaf is ``{"q": int8[..., in, out], "s": f32[..., 1, out]}``
(per-channel int8) or ``{"q4": int8[..., in/2, out], "s": f32[..., in/G, out]}``
(grouped int4, two values nibble-packed per int8 byte along the contracting
dim — TPU runtimes handle s4 arrays poorly at executable boundaries, so the
4-bit format never materializes an s4 array: packing/unpacking is two shifts
on the VPU, fused into the dequant);
``models/llama.dense`` and the embedding lookup dequantize transparently.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

_MIN_QUANT_ELEMS = 2**16


def is_qtensor(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) in ({"q", "s"}, {"q4", "s"})


def quantize_leaf(w):
    """Per-output-channel (last dim) symmetric int8."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def _int4_groups(in_dim: int, group_size: int) -> int:
    """Largest divisor of ``in_dim`` that is ≤ group_size (scale groups must
    tile the contracting dim exactly; hidden sizes are powers-of-two-ish so
    this is almost always group_size itself)."""
    g = min(group_size, in_dim)
    while in_dim % g:
        g -= 1
    return g


def quantize_leaf_int4(w, group_size: int = 128):
    """Group-wise symmetric int4 along the CONTRACTING (second-to-last) dim:
    ``group_size`` input channels share one f32 scale per output channel —
    the AWQ/GPTQ-style W4A16 layout.  Leaf = {"q4": int8[..., in/2, out],
    "s": f32[..., in/G, out]} — HALF-SPLIT nibble packing: byte i holds
    original row i in the low nibble and row i + in/2 in the high nibble.
    Two reasons for this shape over s4 arrays / pair-interleaved packing:
    (a) no s4 array ever crosses an executable boundary (TPU relayout of s4
    inputs is unreliable — observed device_put recursion), and (b) each
    half dequantizes with PURE ELEMENTWISE ops (shift + convert + scale),
    no interleave/concat relayout, so ``int4_matmul`` below can feed the
    two halves to the MXU as ``x_lo @ W_lo + x_hi @ W_hi`` with the dequant
    fused into the operand stream — the measured difference is ~16x decode
    throughput (an interleaving unpack forces XLA to materialize the dense
    bf16 weights every decode step).

    Int4 halves the weight stream vs int8 — decode is weight-bandwidth-bound
    (BASELINE.md), so this is the memory/long-context lever: a 7B decoder is
    ~3.4 GB of weights, leaving HBM for bigger batches / longer contexts."""
    w32 = w.astype(jnp.float32)
    *lead, in_dim, out = w32.shape
    assert in_dim % 2 == 0, f"int4 packing needs an even contracting dim, got {in_dim}"
    # scale groups must not straddle the half boundary
    g = _int4_groups(in_dim // 2, group_size)
    wg = w32.reshape(*lead, in_dim // g, g, out)
    absmax = jnp.max(jnp.abs(wg), axis=-2)                       # [..., in/g, out]
    s = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wg / s[..., None, :]), -7, 7)
    q = q.reshape(*lead, in_dim, out).astype(jnp.int8)
    half = in_dim // 2
    lo, hi = q[..., :half, :], q[..., half:, :]
    return {"q4": (lo & 0xF) | (hi << 4), "s": s}


def _nibbles(packed):
    """(low, high) sign-extended int4 values of a packed byte array — two
    arithmetic shifts each, pure elementwise."""
    return jnp.left_shift(packed, 4) >> 4, packed >> 4


def unpack_int4(packed):
    """Nibble-packed int8 [..., in/2, out] → int4 VALUES as int8 [..., in, out]
    (half-split layout: low nibbles are rows [0, in/2), high the rest)."""
    lo, hi = _nibbles(packed)
    return jnp.concatenate([lo, hi], axis=-2)


def int4_matmul(x, q4, s, out_dtype=None):
    """``x @ dequant(q4, s)``.  x: [..., in], q4: [in/2, out] half-split
    nibble-packed, s: [in/G, out] with G | in/2.

    Small-M calls (single-token decode, speculative verify chunks) dispatch
    to the Pallas kernel (ops/int4_matmul.py), which streams the PACKED
    bytes as the only HBM traffic — the XLA formulation below materializes
    dense dequantized weights every call, which on the decode path measured
    5x slower than W8A8 at 2B and OOMed 7B/bs8 (the fate the int4 path
    exists to avoid).  Large-M (prefill) keeps XLA: one dequant amortizes
    over the whole prompt and the dense MXU dot wins."""
    out_dtype = out_dtype or x.dtype
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if q4.ndim == 2 and M <= 1024:
        from multimodal_unlearning_tpu.ops.int4_matmul import (
            int4_matmul_pallas, supported, use_pallas_int4)

        if use_pallas_int4() and supported(q4, s):
            y = int4_matmul_pallas(x.reshape(M, x.shape[-1]), q4, s, out_dtype)
            return y.reshape(*x.shape[:-1], q4.shape[-1])
    half, out = q4.shape[-2], q4.shape[-1]
    n_groups = s.shape[-2]
    gh = n_groups // 2
    g = half // gh
    lo, hi = _nibbles(q4)

    def dq(q_half, s_half):
        qg = q_half.astype(jnp.float32).reshape(gh, g, out)
        return (qg * s_half[:, None, :]).reshape(half, out).astype(x.dtype)

    y = x[..., :half] @ dq(lo, s[..., :gh, :])
    y = y + x[..., half:] @ dq(hi, s[..., gh:, :])
    return y.astype(out_dtype)


def dequantize_leaf(qt, dtype=jnp.bfloat16):
    if "q4" in qt:  # grouped int4: scales along the contracting dim
        q, s = unpack_int4(qt["q4"]), qt["s"]
        *lead, in_dim, out = q.shape
        n_groups = s.shape[-2]
        qg = q.astype(jnp.float32).reshape(*lead, n_groups, in_dim // n_groups, out)
        return (qg * s[..., :, None, :]).reshape(*lead, in_dim, out).astype(dtype)
    q, s = qt["q"], qt["s"]
    return (q.astype(jnp.float32) * s).astype(dtype)


def embed_lookup(et, input_ids):
    """Dequantizing embedding lookup for a QTensor table [V, H]: gather the
    quantized rows, then the matching scales (int8: one [1,H] channel-scale
    row; int4: the token's vocab-group row of the [V/G, H] grid).  Int4
    tables are nibble-packed along V — gather the pair row, pick the
    token's nibble."""
    s = et["s"]
    if "q4" in et:
        half = et["q4"].shape[0]
        prow = jnp.take(et["q4"], input_ids % half, axis=0)  # [..., H]
        lo, hi = _nibbles(prow)
        rows = jnp.where((input_ids < half)[..., None], lo, hi)
        g = 2 * half // s.shape[0]
        return rows.astype(jnp.float32) * jnp.take(s, input_ids // g, axis=0)
    rows = jnp.take(et["q"], input_ids, axis=0).astype(jnp.float32)
    return rows * s[0]


@_functools.lru_cache(maxsize=None)
def _jitted_leaf_quantizer(bits: int, group_size: int):
    """One shared jitted leaf-quantize fn per (bits, group_size) so the
    whole-tree and in-place paths produce BIT-IDENTICAL leaves (an eager vs
    jitted absmax differs by ~1 ulp, which moves every scale)."""
    if bits == 8:
        return jax.jit(quantize_leaf)
    return jax.jit(lambda w: quantize_leaf_int4(w, group_size))


def _want_quant(v, min_elems: int) -> bool:
    return (
        hasattr(v, "ndim") and v.ndim >= 2
        and v.shape[-1] >= 256 and v.shape[-2] >= 256  # matmul weights only
        and v.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
        and v.size >= min_elems
    )


def quantize_tree(params, *, bits: int = 8, group_size: int = 128,
                  min_elems: int = _MIN_QUANT_ELEMS):
    """Quantize every large (≥2-D) float leaf; small leaves stay as-is.
    ``bits`` ∈ {8, 4}: 8 = per-output-channel int8 (the W8A16/W8A8 base),
    4 = grouped int4 (W4A16 — dequant-only, halves the weight stream again)."""
    assert bits in (8, 4), bits
    qfn = _jitted_leaf_quantizer(bits, group_size)
    return jax.tree.map(
        lambda x: qfn(x) if _want_quant(x, min_elems) else x, params)


def quantize_tree_inplace(params, *, bits: int = 8, group_size: int = 128,
                          min_elems: int = _MIN_QUANT_ELEMS):
    """Destructive ``quantize_tree`` for device trees near the HBM ceiling.

    ``quantize_tree`` builds the whole quantized tree while the float tree
    is still alive — at 7B that is 13.5 GB bf16 + 6.7 GB int8 resident at
    once, which OOMs a 16 GB v5e before training starts (observed in
    examples/e2e_7b_pipeline.py).  This variant quantizes leaf by leaf and
    DELETES each source buffer before touching the next, so the peak is
    the float tree plus ONE leaf's transients.  The input dict is mutated
    and also returned; every jax.Array it held for a quantized leaf is
    dead afterwards.  Leaves are bit-identical to ``quantize_tree``'s (both
    call the same jitted leaf fn).

    Only nested dicts are traversed (current param trees are all dicts);
    a list/tuple container would be silently skipped, so it raises."""
    assert bits in (8, 4), bits
    qfn = _jitted_leaf_quantizer(bits, group_size)

    def rec(d, path):
        if not isinstance(d, dict) or is_qtensor(d):
            return d
        for key in list(d.keys()):
            v = d[key]
            if isinstance(v, dict):
                rec(v, path + (key,))
            elif isinstance(v, (list, tuple)):
                raise TypeError(
                    "quantize_tree_inplace traverses dicts only; found a "
                    f"{type(v).__name__} container at {'/'.join(path + (key,))} "
                    "— use quantize_tree or restructure the tree as dicts")
            elif _want_quant(v, min_elems):
                q = qfn(v)
                jax.block_until_ready(q)
                if isinstance(v, jax.Array):
                    v.delete()
                d[key] = q
        return d

    return rec(params, ())


def dequantize_tree(params, dtype=jnp.bfloat16):
    """Dense copy of a (possibly partially) quantized tree: every QTensor
    leaf dequantized to ``dtype``, everything else untouched — for
    checkpoint saving and LoRA merging."""
    if is_qtensor(params):
        return dequantize_leaf(params, dtype)
    if isinstance(params, dict):
        return {k: dequantize_tree(v, dtype) for k, v in params.items()}
    return params


def tree_nbytes(tree) -> int:
    # q4 leaves are physically int8 nibble pairs — plain itemsize is exact
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "size")
    )


# ---------------------------------------------------------------------------
# W8A8 matmul (opt-in): dynamic per-row int8 activations against int8 weights
# — runs on the int8 MXU path (~1.75× the bf16 rate on v5e).  Backward is a
# straight-through bf16 matmul against the dequantized weight (the weight is
# frozen, so only dx is needed).
# ---------------------------------------------------------------------------


INT8_BWD = False  # set via enable_int8_bwd(); int8 MXU for the dx backward too


def enable_int8_bwd(on: bool = True):
    """Opt-in: run the dx backward of quantized matmuls on the int8 MXU as
    well (per-row dynamic quantization of dy with the weight's column scales
    folded in).  2× the bf16 backward matmul rate; adds int8 rounding noise
    to upstream gradients — gate on a forget-quality check like int8_compute.
    Trace-time flag: set it BEFORE the first jitted step compiles."""
    global INT8_BWD
    INT8_BWD = on


def _int8_dx(dy, q, s):
    """dx = dy @ W^T for W = q·s (s per output column of W): fold s into dy
    elementwise, per-row quantize, contract int8 against q's columns."""
    dys = dy.astype(jnp.float32) * s.reshape(-1)
    a = jnp.max(jnp.abs(dys), axis=-1, keepdims=True)
    sdy = jnp.where(a > 0, a / 127.0, 1.0)
    dq = jnp.clip(jnp.round(dys / sdy), -127, 127).astype(jnp.int8)
    dx32 = jax.lax.dot_general(
        dq, q, (((dy.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (dx32.astype(jnp.float32) * sdy).astype(dy.dtype)


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_matmul(x, q, s):
    y, _ = _int8_matmul_fwd(x, q, s)
    return y


def _int8_matmul_fwd(x, q, s):
    xa = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(xa > 0, xa / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = (y32.astype(jnp.float32) * sx * s.reshape(-1)).astype(x.dtype)
    return y, (q, s)


def _int8_matmul_bwd(res, dy):
    q, s = res
    if INT8_BWD:
        return _int8_dx(dy, q, s), None, None
    w = (q.astype(jnp.float32) * s).astype(dy.dtype)  # dequant once per layer
    dx = jax.lax.dot_general(
        dy, w, (((dy.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dy.dtype)
    return dx, None, None


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# ---------------------------------------------------------------------------
# Grouped W8A8 matmuls: several projections sharing ONE input (q/k/v share
# the attention input, gate/up share the MLP input) quantize the activations
# once instead of per-projection — cuts the dynamic-quantization VPU work
# from 7 to 4 passes per decoder layer.
# ---------------------------------------------------------------------------


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_matmul_group(x, qs, ss):
    ys, _ = _int8_group_fwd(x, qs, ss)
    return ys


def _int8_group_fwd(x, qs, ss):
    xa = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(xa > 0, xa / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    ys = tuple(
        (
            jax.lax.dot_general(
                xq, q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            * sx
            * s.reshape(-1)
        ).astype(x.dtype)
        for q, s in zip(qs, ss)
    )
    return ys, (qs, ss)


def _int8_group_bwd(res, dys):
    qs, ss = res
    dx = None
    dt = None
    for dy, q, s in zip(dys, qs, ss):
        dt = dy.dtype
        if INT8_BWD:
            t = _int8_dx(dy, q, s).astype(jnp.float32)
        else:
            w = (q.astype(jnp.float32) * s).astype(dy.dtype)
            t = jax.lax.dot_general(
                dy, w, (((dy.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        dx = t if dx is None else dx + t
    return dx.astype(dt), None, None


int8_matmul_group.defvjp(_int8_group_fwd, _int8_group_bwd)


# ---------------------------------------------------------------------------
# W8A8 MoE expert einsums (ops/moe.py dense route): the expert-stacked
# weights [E, in, out] (one layer's slice of the [L,E,in,out] stack) run on
# the int8 MXU against dynamically quantized activations.  Forward-only
# quantization with a dequantized-bf16 dx backward (the expert stacks are
# frozen under LoRA forget runs — only dx flows through them), mirroring
# int8_matmul's contract.
# ---------------------------------------------------------------------------


def _rowquant(x):
    """Per-row (last axis) symmetric int8: returns (xq int8, sx f32[..., 1])."""
    xa = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(xa > 0, xa / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_moe_up_group(x, q_gate, s_gate, q_up, s_up):
    ys, _ = _int8_moe_up_fwd(x, q_gate, s_gate, q_up, s_up)
    return ys


def _int8_moe_up_fwd(x, q_gate, s_gate, q_up, s_up):
    """x [B,S,H] → (gate, up) each [E,B,S,I]; one activation quantization
    shared by both projections (the grouped-W8A8 trick)."""
    xq, sx = _rowquant(x)

    def one(q, s):
        # [B,S,H] · [E,H,I] contracting H → [B,S,E,I] int32
        y32 = jax.lax.dot_general(
            xq, q, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * sx[..., None] * s[:, 0][None, None]).astype(x.dtype)
        return y.transpose(2, 0, 1, 3)  # [E,B,S,I]

    return (one(q_gate, s_gate), one(q_up, s_up)), (q_gate, s_gate, q_up, s_up)


def _int8_moe_up_bwd(res, dys):
    q_gate, s_gate, q_up, s_up = res
    dt = dys[0].dtype
    dx = None
    for dy, q, s in zip(dys, (q_gate, q_up), (s_gate, s_up)):
        w = (q.astype(jnp.float32) * s).astype(dt)  # [E,H,I]
        t = jnp.einsum("ebsi,ehi->bsh", dy, w).astype(jnp.float32)
        dx = t if dx is None else dx + t
    return dx.astype(dt), None, None, None, None


int8_moe_up_group.defvjp(_int8_moe_up_fwd, _int8_moe_up_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_moe_down(ff, q, s):
    y, _ = _int8_moe_down_fwd(ff, q, s)
    return y


def _int8_moe_down_fwd(ff, q, s):
    """ff [E,B,S,I] · down [E,I,H] (batched over E) → [E,B,S,H]."""
    ffq, sf = _rowquant(ff)
    y32 = jax.lax.dot_general(
        ffq, q, (((3,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )
    y = (y32.astype(jnp.float32) * sf * s[:, None]).astype(ff.dtype)
    return y, (q, s)


def _int8_moe_down_bwd(res, dy):
    q, s = res
    w = (q.astype(jnp.float32) * s).astype(dy.dtype)  # [E,I,H]
    dff = jnp.einsum("ebsh,eih->ebsi", dy, w)
    return dff.astype(dy.dtype), None, None


int8_moe_down.defvjp(_int8_moe_down_fwd, _int8_moe_down_bwd)
