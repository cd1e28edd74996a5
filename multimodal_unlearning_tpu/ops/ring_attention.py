"""Ring attention: causal flash attention with the sequence sharded over a
mesh axis (sequence/context parallelism over ICI).

Beyond-reference (SURVEY.md §5: the reference has no sequence parallelism;
the flash kernel was written blockwise so this is a wrapper, not a rewrite).

Layout: q, k, v are sharded along the sequence dim over ``axis`` (each of
the N devices holds a contiguous chunk; chunk c covers global positions
[c·C, (c+1)·C)).  Per ring step s, device i attends its q chunk against the
k/v chunk originating from device (i−s) mod N:

- s == 0: the diagonal — local causal attention;
- 0 < s ≤ i: a fully-past chunk — dense (non-causal) attention;
- s > i: a future chunk — contributes nothing (lse = −inf).

Forward merges partials with the online-softmax rule on (o, lse); k/v (and
the kv padding mask) rotate with ``jax.lax.ppermute`` (ICI neighbor hops),
overlapping communication with the next step's compute under XLA's
scheduler.

Backward is a second ring over the SAME Pallas kernels as single-chip flash
(ops/attention.py:_bwd): given the global lse and delta, the flash backward
decomposes over kv chunks — each ring step computes this chunk's (dq partial,
dk/dv partial); dk/dv accumulators rotate with their chunk and take one
final hop home.  Full custom VJP, so ring attention is trainable end-to-end.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_unlearning_tpu.ops.attention import _bwd, _fwd

_NEG_INF = -1e30
_BLOCK_Q = 256
_BLOCK_K = 512


def _attn_with_lse(q, k, v, kv_mask, *, causal, impl):
    """(o fp32, lse [B,H,Sq] fp32) for one (q chunk, kv chunk) pair."""
    if impl in ("pallas", "interpret"):
        o, lse = _fwd(
            q, k, v, kv_mask, causal=causal, q_offset=0,
            sm_scale=q.shape[-1] ** -0.5,
            block_q=_BLOCK_Q, block_k=_BLOCK_K, interpret=impl == "interpret",
        )
        return o.astype(jnp.float32), lse[..., 0]
    # XLA path
    B, Hq, Sq, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    kk = jnp.repeat(k, group, axis=1) if group > 1 else k
    vv = jnp.repeat(v, group, axis=1) if group > 1 else v
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32)) * (D**-0.5)
    mask = kv_mask[:, :, None, :].astype(bool)
    if causal:
        qi = jnp.arange(Sq)[:, None]
        ki = jnp.arange(k.shape[2])[None, :]
        mask = mask & (qi >= ki)[None, None]
    s = jnp.where(mask, s, _NEG_INF)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    lse = jnp.where(lse < _NEG_INF / 2, _NEG_INF, lse)
    p = jnp.where(lse[..., None] > _NEG_INF / 2, jnp.exp(s - lse[..., None]), 0.0)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vv.astype(jnp.float32))
    return o, lse


def _merge(o1, lse1, o2, lse2):
    """Online-softmax merge of two normalized partials (fp32)."""
    lse = jnp.logaddexp(lse1, lse2)
    safe = lse > _NEG_INF / 2
    w1 = jnp.where(safe, jnp.exp(lse1 - lse), 0.0)[..., None]
    w2 = jnp.where(safe, jnp.exp(lse2 - lse), 0.0)[..., None]
    return o1 * w1 + o2 * w2, lse


def _ring_fwd(q, k, v, kv_mask, *, axis: str, impl: str):
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    o, lse = _attn_with_lse(q, k, v, kv_mask, causal=True, impl=impl)

    def step(s, carry):
        o, lse, k_cur, v_cur, m_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        m_cur = jax.lax.ppermute(m_cur, axis, perm)
        o_p, lse_p = _attn_with_lse(q, k_cur, v_cur, m_cur, causal=False, impl=impl)
        include = s <= idx  # source chunk is strictly in the past
        lse_p = jnp.where(include, lse_p, _NEG_INF)
        o_new, lse_new = _merge(o, lse, o_p, lse_p)
        return o_new, lse_new, k_cur, v_cur, m_cur

    o, lse, _, _, _ = jax.lax.fori_loop(1, n, step, (o, lse, k, v, kv_mask))
    return o.astype(q.dtype), lse


def _chunk_bwd(q, k, v, kv_mask, o, lse, do, *, causal, impl):
    """One (q chunk, kv chunk) backward through the flash bwd kernels."""
    sm_scale = q.shape[-1] ** -0.5
    if impl in ("pallas", "interpret"):
        dq, dk, dv, _ = _bwd(
            causal, 0, sm_scale, _BLOCK_Q, _BLOCK_K, impl == "interpret",
            (q, k, v, kv_mask, o, lse[..., None]), (do, None),
        )
        return dq, dk, dv

    # XLA path: differentiate a rebuilt chunk forward normalized by the
    # GLOBAL lse (matches the flash decomposition)
    def chunk_out(q_, k_, v_):
        B, Hq, Sq, D = q_.shape
        group = Hq // k_.shape[1]
        kk = jnp.repeat(k_, group, axis=1) if group > 1 else k_
        vv = jnp.repeat(v_, group, axis=1) if group > 1 else v_
        s = jnp.einsum("bhqd,bhkd->bhqk", q_.astype(jnp.float32), kk.astype(jnp.float32)) * sm_scale
        mask = kv_mask[:, :, None, :].astype(bool)
        if causal:
            qi = jnp.arange(Sq)[:, None]
            ki = jnp.arange(k_.shape[2])[None, :]
            mask = mask & (qi >= ki)[None, None]
        lse_safe = jnp.where(lse < _NEG_INF / 2, 0.0, lse)
        p = jnp.where(mask, jnp.exp(s - lse_safe[..., None]), 0.0)
        p = jnp.where((lse < _NEG_INF / 2)[..., None], 0.0, p)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vv.astype(jnp.float32))
        # delta correction: flash ds subtracts delta=Σ do·o; emulate by
        # treating the normalization as constant (lse is stop-grad global)
        return out.astype(q_.dtype)

    _, vjp = jax.vjp(chunk_out, q, k, v)
    dq, dk, dv = vjp(do)
    # the flash backward's delta term: ds -= p·delta ⇒ dq/dk corrections.
    # chunk_out above treats lse as constant, which reproduces exactly the
    # p = exp(s − lse) linearization the pallas kernels use EXCEPT the delta
    # subtraction; apply it via a rank-1 correction.
    B, Hq, Sq, D = q.shape
    group = Hq // k.shape[1]
    kk = jnp.repeat(k, group, axis=1) if group > 1 else k
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32)) * sm_scale
    mask = kv_mask[:, :, None, :].astype(bool)
    if causal:
        qi = jnp.arange(Sq)[:, None]
        ki = jnp.arange(k.shape[2])[None, :]
        mask = mask & (qi >= ki)[None, None]
    lse_safe = jnp.where(lse < _NEG_INF / 2, 0.0, lse)
    p = jnp.where(mask, jnp.exp(s - lse_safe[..., None]), 0.0)
    p = jnp.where((lse < _NEG_INF / 2)[..., None], 0.0, p)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [B,H,Sq]
    ds_corr = -p * delta[..., None] * sm_scale  # [B,H,Sq,Sk]
    dq = (dq.astype(jnp.float32) + jnp.einsum("bhqk,bhkd->bhqd", ds_corr, kk.astype(jnp.float32))).astype(q.dtype)
    dk_corr = jnp.einsum("bhqk,bhqd->bhkd", ds_corr, q.astype(jnp.float32))
    if group > 1:
        dk_corr = dk_corr.reshape(B, k.shape[1], group, *dk_corr.shape[2:]).sum(2)
    dk = (dk.astype(jnp.float32) + dk_corr).astype(k.dtype)
    return dq, dk, dv


def _make_ring(axis: str, impl: str):
    @jax.custom_vjp
    def ring(q, k, v, kv_mask):
        o, _ = _ring_fwd(q, k, v, kv_mask, axis=axis, impl=impl)
        return o

    def fwd(q, k, v, kv_mask):
        o, lse = _ring_fwd(q, k, v, kv_mask, axis=axis, impl=impl)
        return o, (q, k, v, kv_mask, o, lse)

    def bwd(res, do):
        q, k, v, kv_mask, o, lse = res
        n = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]

        dq, dk, dv = _chunk_bwd(q, k, v, kv_mask, o, lse, do, causal=True, impl=impl)
        dq = dq.astype(jnp.float32)
        dk = dk.astype(jnp.float32)
        dv = dv.astype(jnp.float32)

        def step(s, carry):
            dq, dk_acc, dv_acc, k_cur, v_cur, m_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            m_cur = jax.lax.ppermute(m_cur, axis, perm)
            dk_acc = jax.lax.ppermute(dk_acc, axis, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis, perm)
            dq_p, dk_p, dv_p = _chunk_bwd(
                q, k_cur, v_cur, m_cur, o, lse, do, causal=False, impl=impl
            )
            include = (s <= idx).astype(jnp.float32)
            dq = dq + dq_p.astype(jnp.float32) * include
            dk_acc = dk_acc + dk_p.astype(jnp.float32) * include
            dv_acc = dv_acc + dv_p.astype(jnp.float32) * include
            return dq, dk_acc, dv_acc, k_cur, v_cur, m_cur

        dq, dk, dv, _, _, _ = jax.lax.fori_loop(1, n, step, (dq, dk, dv, k, v, kv_mask))
        # accumulators have rotated n−1 hops with their chunk; one more
        # ppermute returns each chunk's gradient to its home device
        dk = jax.lax.ppermute(dk, axis, perm)
        dv = jax.lax.ppermute(dv, axis, perm)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None

    ring.defvjp(fwd, bwd)
    return ring


def ring_flash_attention(
    q, k, v, mesh, *, axis: str = "seq", kv_mask=None, impl: str = "auto",
    batch_axes=None,
):
    """Causal attention over sequence-sharded q/k/v with full gradients.

    q: [B, Hq, S, D]; k, v: [B, Hkv, S, D] (GQA supported); kv_mask: [B, S]
    validity (padding).  Arrays are global; shard_map splits the sequence
    over ``axis`` and the ring runs over ICI neighbor permutes.
    ``batch_axes``: mesh axes the batch dim is data-parallel over (keeps the
    dp sharding inside the shard_map instead of forcing an all-gather).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32).reshape(q.shape[0], 1, k.shape[2])

    from jax import shard_map

    spec = P(batch_axes, None, axis, None)
    mspec = P(batch_axes, None, axis)
    fn = shard_map(
        _make_ring(axis, impl),
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, kv_mask)
