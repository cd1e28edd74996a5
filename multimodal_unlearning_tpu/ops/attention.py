"""Pallas flash attention for TPU (forward + backward).

TPU-native replacement for the FlashAttention-2 CUDA dependency the reference
engages via ``attn_implementation="flash_attention_2"`` (reference:
mm/forget.py:86, mm/eval.py:201, nlp/forget.py:102, README.md:40-42).

Design (written blockwise so a later ring-attention extension over ICI is a
wrapper, per SURVEY.md §5):

- grid ``(batch, q_heads, q_blocks)``; K/V streamed per (batch, kv_head) into
  VMEM once and looped over in ``BLOCK_K`` tiles with an online softmax;
- GQA handled in the BlockSpec index map (q head ``h`` reads kv head
  ``h // group``) — no materialized head broadcast;
- padding handled with a per-token ``kv_mask`` (left- or right-padding) and
  causal masking with a ``q_offset`` so the same kernel serves prefill and
  KV-cache decode;
- fp32 accumulation on the MXU (``preferred_element_type``), bf16 I/O;
- custom VJP with two Pallas backward kernels (dq; dk/dv), flash-style
  recomputation from the saved logsumexp.

On non-TPU backends ``flash_attention`` falls back to the XLA reference
implementation (same math, fused by XLA) so the whole framework runs on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _default_blocks(sq: int, sk: int) -> tuple[int, int]:
    """Empirical block preferences (examples/attn_block_sweep.py on v5e):
    at the bench shape S=768 D=128, bq=384/bk=768 runs fwd 0.452 ms vs
    0.525 ms and fwd+bwd 0.661 ms vs 0.768 ms against the 256/384 the old
    fixed defaults resolved to; at S=2048 the picks fall back to 256/512
    (the tuned long-seq point).  Whole-sequence K blocks only up to 1024
    rows (VMEM: 1024x128 bf16 k + v = 512 KB)."""
    bq = 384 if sq % 384 == 0 else DEFAULT_BLOCK_Q
    bk = sk if (sk <= 1024 and sk % 128 == 0) else DEFAULT_BLOCK_K
    return bq, bk
_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # log2(e): fold into the q prescale so the
# online softmax runs on native exp2 (VPU) with no per-score multiply
_LN2 = 0.6931471805599453


def _pick_block(seq: int, pref: int) -> int:
    # largest lane-aligned divisor of seq that fits the preference — e.g.
    # S=768, pref 512 → 384 (the halving rule would land on 256; measured
    # 12% slower fwd+bwd at the bench shape)
    if seq % 128 == 0:
        for b in range(min(pref, seq), 127, -128):
            if seq % b == 0:
                return b
    b = min(pref, seq)
    while seq % b:
        b //= 2
    return max(b, 1)


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — ground truth for tests and CPU fallback
# ---------------------------------------------------------------------------


def mha_reference(q, k, v, kv_mask=None, *, causal=False, q_offset=0, sm_scale=None):
    """Plain XLA attention with identical masking semantics.

    q: [B, Hq, Sq, D]; k, v: [B, Hkv, Sk, D]; kv_mask: [B, Sk] (1 = valid).
    ``q_offset`` positions query i at absolute index ``q_offset + i`` for
    causal masking (KV-cache decode).
    """
    B, Hq, Sq, D = q.shape
    Hkv = k.shape[1]
    if sm_scale is None:
        sm_scale = D**-0.5
    group = Hq // Hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    # promote — never demote: bf16 runs in fp32 (torch sdpa upcasts its
    # softmax too), f64 parity runs (vs torch sdpa in f64) stay exact
    acc_t = jnp.promote_types(q.dtype, jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(acc_t), k.astype(acc_t)) * sm_scale
    mask = jnp.ones((B, 1, Sq, k.shape[2]), dtype=bool)
    if kv_mask is not None:
        mask &= kv_mask[:, None, None, :].astype(bool)
    if causal:
        qi = jnp.arange(Sq)[:, None] + q_offset
        ki = jnp.arange(k.shape[2])[None, :]
        mask &= (qi >= ki)[None, None]
    s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # fully-masked rows: softmax over -inf row is uniform garbage; zero it
    any_valid = mask.any(axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(acc_t))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, sm_scale, causal, block_k, q_offset):
    qi = pl.program_id(2)
    block_q = q_ref.shape[2]
    sk = k_ref.shape[2]
    nk = sk // block_k

    # pre-scale q once by sm_scale·log2(e) (flash-attn convention) — the
    # inner loop then needs no per-score multiply and uses the VPU's native
    # exp2; scores live in log2 space until the final lse conversion
    q = (q_ref[0, 0].astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q_ref.dtype)

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + q_offset

    def step(j, carry, masked: bool):
        m, l, acc = carry
        off = pl.multiple_of(j * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(off, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(off, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Bq, Bk], log2-space scores

        if masked:
            valid = mask_ref[0, :, pl.ds(off, block_k)].astype(jnp.bool_)
            if causal:
                k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                valid = valid & (q_pos >= k_pos)
            s = jnp.where(valid, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        if masked:
            # fully-masked rows: m_new == _NEG_INF ⇒ exp2(0) == 1 — re-mask
            p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    if causal:
        nk_eff = jnp.minimum(nk, pl.cdiv((qi + 1) * block_q + q_offset, block_k))
    else:
        nk_eff = nk
    m, l, acc = jax.lax.fori_loop(0, nk_eff, lambda j, c: step(j, c, True), (m0, l0, acc0))

    l_safe = jnp.where(l > 0, l, 1.0)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    # natural-log lse for the backward kernels: ln(Σexp(s_nat)) = ln2·m + ln(l)
    lse = jnp.where(l > 0, m * _LN2 + jnp.log(l_safe), _NEG_INF)
    lse_ref[0, 0] = lse


def _fwd(q, k, v, kv_mask, *, causal, q_offset, sm_scale, block_q, block_k, interpret):
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    group = Hq // Hkv
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    nq = Sq // block_q

    grid = (B, Hq, nq)
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((B, Hq, Sq, 1), jnp.float32),
    ]
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, block_k=block_k, q_offset=q_offset
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret or pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
    )(q, k, v, kv_mask)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref, *, sm_scale, causal, block_k, q_offset):
    qi = pl.program_id(2)
    block_q = q_ref.shape[2]
    sk = k_ref.shape[2]
    nk = sk // block_k

    # fold sm_scale·log2(e) into q — scores land in log2 space for native
    # exp2; dq then needs a final sm_scale factor
    q = (q_ref[0, 0].astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q_ref.dtype)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    # dead rows (all kv masked) carry lse = −1e30; exp(s − lse) would be inf
    lse = jnp.where(lse < _NEG_INF / 2, -_NEG_INF, lse)
    lse2 = lse * _LOG2E  # log2-space lse, [Bq, 1]
    delta = delta_ref[0, 0]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + q_offset
    dq0 = jnp.zeros(q.shape, jnp.float32)

    def step(j, dq, masked: bool):
        off = pl.multiple_of(j * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(off, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(off, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse2)
        if masked:
            valid = mask_ref[0, :, pl.ds(off, block_k)].astype(jnp.bool_)
            if causal:
                k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                valid = valid & (q_pos >= k_pos)
            p = jnp.where(valid, p, 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        nk_eff = jnp.minimum(nk, pl.cdiv((qi + 1) * block_q + q_offset, block_k))
    else:
        nk_eff = nk
    dq = jax.lax.fori_loop(0, nk_eff, lambda j, c: step(j, c, True), dq0)
    # dq accumulated against the prescaled q's k-products: ds@k needs only the
    # natural sm_scale chain factor (the log2e lives in p's computation, not
    # its value)
    dq_ref[0, 0] = (dq * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, sm_scale, causal, block_q, q_offset):
    ki = pl.program_id(2)
    block_k = k_ref.shape[2]
    sq = q_ref.shape[2]
    nq = sq // block_q

    k_blk = k_ref[0, 0]  # [Bk, D]
    v_blk = v_ref[0, 0]
    valid_k = mask_ref[0, :, pl.ds(pl.multiple_of(ki * block_k, block_k), block_k)].astype(jnp.bool_)

    dk0 = jnp.zeros(k_blk.shape, jnp.float32)
    dv0 = jnp.zeros(v_blk.shape, jnp.float32)

    def step(i, carry, masked: bool):
        dk, dv = carry
        qoff = pl.multiple_of(i * block_q, block_q)
        q_raw = q_ref[0, 0, pl.ds(qoff, block_q), :]
        # prescale on [Bq, D] instead of post-multiplying scores on [Bq, Bk]
        q = (q_raw.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q_raw.dtype)
        do = do_ref[0, 0, pl.ds(qoff, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qoff, block_q), :]
        lse = jnp.where(lse < _NEG_INF / 2, -_NEG_INF, lse)  # dead-row guard
        delta = delta_ref[0, 0, pl.ds(qoff, block_q), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse * _LOG2E)
        if masked:
            valid = valid_k
            if causal:
                q_pos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + q_offset
                k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                valid = valid & (q_pos >= k_pos)
            p = jnp.where(valid, p, 0.0)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        # dk = [p·(dp−δ)·sm_scale] @ q_raw == [p·(dp−δ)·ln2] @ q_prescaled
        ds = p * (dp - delta) * _LN2
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    if causal:
        # first q block that can see this k block
        start = jnp.maximum(0, (ki * block_k - q_offset) // block_q)
    else:
        start = 0
    dk, dv = jax.lax.fori_loop(start, nq, lambda i, c: step(i, c, True), (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(causal, q_offset, sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask, o, lse = res
    do, _ = g
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    group = Hq // Hkv
    bq = _pick_block(Sq, block_q)
    bk = _pick_block(Sk, block_k)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # [B,Hq,Sq,1]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal, block_k=bk, q_offset=q_offset),
        grid=(B, Hq, Sq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        compiler_params=None if interpret or pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
    )(q, k, v, kv_mask, do, lse, delta)

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal, block_q=bq, q_offset=q_offset),
        grid=(B, Hq, Sk // bk),
        in_specs=[
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h // group, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h // group, i, 0)),
            pl.BlockSpec((1, 1, Sk), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 1), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 1), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sk, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sk, D), q.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret or pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
    )(q, k, v, kv_mask, do, lse, delta)

    if group > 1:
        dk = dk_h.reshape(B, Hkv, group, Sk, D).sum(axis=2).astype(k.dtype)
        dv = dv_h.reshape(B, Hkv, group, Sk, D).sum(axis=2).astype(v.dtype)
    else:
        dk, dv = dk_h, dv_h
    return dq, dk, dv, None


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, kv_mask, causal, q_offset, sm_scale, block_q, block_k, interpret):
    o, _ = _fwd(
        q, k, v, kv_mask,
        causal=causal, q_offset=q_offset, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return o


def _flash_fwd(q, k, v, kv_mask, causal, q_offset, sm_scale, block_q, block_k, interpret):
    o, lse = _fwd(
        q, k, v, kv_mask,
        causal=causal, q_offset=q_offset, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return o, (q, k, v, kv_mask, o, lse)


def _flash_bwd(causal, q_offset, sm_scale, block_q, block_k, interpret, res, g):
    return _bwd(causal, q_offset, sm_scale, block_q, block_k, interpret, res, (g, None))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q,
    k,
    v,
    kv_mask=None,
    *,
    causal: bool = False,
    q_offset: int = 0,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    impl: str = "auto",
):
    """Fused multi-head attention.

    Args:
      q: [B, Hq, Sq, D]; k, v: [B, Hkv, Sk, D] with Hq % Hkv == 0 (GQA).
      kv_mask: [B, Sk] validity mask (1 = attend), handles left/right padding.
      causal: causal masking with absolute positions (see q_offset).
      q_offset: absolute position of q[0] (KV-cache decode).
      impl: 'pallas' | 'xla' | 'interpret' | 'auto' (pallas on TPU else xla).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and (q.shape[2] % 128 or k.shape[2] % 128):
        # Mosaic requires lane-aligned dynamic slices; odd buckets take the
        # XLA path (pad sequences to multiples of 128 for the fast path)
        impl = "xla"
    if impl == "xla":
        return mha_reference(q, k, v, kv_mask, causal=causal, q_offset=q_offset, sm_scale=sm_scale)
    if block_q is None or block_k is None:
        dq, dk = _default_blocks(q.shape[2], k.shape[2])
        block_q = dq if block_q is None else block_q
        block_k = dk if block_k is None else block_k
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32).reshape(q.shape[0], 1, k.shape[2])
    return _flash(
        q, k, v, kv_mask, causal, q_offset, sm_scale, block_q, block_k, impl == "interpret"
    )
