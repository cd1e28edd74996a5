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

Partials are merged with the standard online-softmax rule on (o, lse);
k/v rotate around the ring with ``jax.lax.ppermute`` (ICI neighbor hops),
overlapping communication with the next step's compute under XLA's
scheduler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_unlearning_tpu.ops.attention import _fwd


_NEG_INF = -1e30


def _attn_with_lse(q, k, v, *, causal, impl):
    """(o, lse[B,H,Sq]) — pallas fwd kernel or a differentiable XLA path."""
    if impl in ("pallas", "interpret"):
        kv_mask = jnp.ones((q.shape[0], 1, k.shape[2]), jnp.int32)
        o, lse = _fwd(
            q, k, v, kv_mask, causal=causal, q_offset=0,
            sm_scale=q.shape[-1] ** -0.5,
            block_q=256, block_k=512, interpret=impl == "interpret",
        )
        return o, lse[..., 0]
    # XLA path (differentiable)
    B, H, Sq, D = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * (D**-0.5)
    if causal:
        qi = jnp.arange(Sq)[:, None]
        ki = jnp.arange(k.shape[2])[None, :]
        s = jnp.where((qi >= ki)[None, None], s, _NEG_INF)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
    return o, lse


def _merge(o1, lse1, o2, lse2):
    """Online-softmax merge of two normalized partials."""
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2).astype(o1.dtype), lse


def _ring_body(q, k, v, *, axis: str, impl: str):
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)

    # step 0: local diagonal (causal)
    o, lse = _attn_with_lse(q, k, v, causal=True, impl=impl)
    o = o.astype(jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]  # chunk from i goes to i+1

    def step(s, carry):
        o, lse, k_cur, v_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        o_p, lse_p = _attn_with_lse(q, k_cur, v_cur, causal=False, impl=impl)
        include = s <= idx  # source chunk is strictly in the past
        lse_p = jnp.where(include, lse_p, _NEG_INF)
        o_new, lse_new = _merge(o, lse, o_p.astype(jnp.float32), lse_p)
        return o_new, lse_new, k_cur, v_cur

    o, lse, _, _ = jax.lax.fori_loop(1, n, step, (o, lse, k, v))
    return o.astype(q.dtype)


def ring_flash_attention(q, k, v, mesh, *, axis: str = "data", impl: str = "auto"):
    """Causal attention over sequence-sharded q/k/v.

    q, k, v: [B, H, S, D] global arrays (sharded or not — outputs follow the
    sequence-sharded layout over ``axis``).  Gradient support on the XLA
    path; the pallas path is forward-only for now (the bwd ring is a later
    extension).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    from jax import shard_map

    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_body, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
