"""W4A16 matmul: ``x @ dequant(q4, s)`` streaming PACKED int4 from HBM.

Decode at 7B is weight-stream-bound (BASELINE.md): every generated token
re-reads the whole decoder.  Grouped int4 (utils/quantize.py) halves the
int8 stream — but only if the dequantization never touches HBM.  The XLA
formulation (dequantize the half, then dot) materializes dense bf16/f32
weights for every layer of every decode step: measured 438 tok/s at the 2B
op point vs 2232 for W8A8 (5x SLOWER than the int8 path it was meant to
beat), and ResourceExhausted at 7B/bs8 where the f32 dequant transients
don't fit alongside the KV cache.

This kernel keeps the packed bytes as the ONLY HBM traffic (0.5 byte per
weight + f32 group scales): each grid step DMAs a [bk, bn] packed block
into VMEM, sign-extends the two nibbles in-register (exact in bf16 —
|int4| <= 7), and contracts one 128-wide scale group at a time so the f32
group scale applies to the dot PARTIAL, never to a materialized weight:

    y = sum_g  (x_lo[:, g] @ lo_g) * s_lo[g]  +  (x_hi[:, g] @ hi_g) * s_hi[g]

which is bit-for-bit the grouped-dequant definition rearranged (scales are
per (group, out-channel), constant across the contraction inside a group).

Used for the small-M calls (single-token decode, speculative verify
chunks); prefill keeps the XLA path, where one dequant amortizes over the
whole prompt and the MXU-shaped dense dot wins.

Replaces: bitsandbytes-style CUDA 4-bit kernels (reference dep, SURVEY
S2.9); the XLA path in utils/quantize.int4_matmul remains the CPU fallback.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _kernel(x_lo_ref, x_hi_ref, q4_ref, slo_ref, shi_ref, o_ref, acc_ref,
            *, gpb: int):
    # slo/shi blocks carry the FULL [gh, bn] scale panel (a (1, bn) block
    # would violate Mosaic's 8-sublane block minimum); the k grid step
    # owns groups [k*gpb, (k+1)*gpb)
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # sign-extend both nibbles of the packed byte block (values in [-7, 7]
    # — exact in any float dtype)
    v = q4_ref[...].astype(jnp.int32)
    lo = ((v << 28) >> 28).astype(x_lo_ref.dtype)
    hi = (v >> 4).astype(x_lo_ref.dtype)
    xl = x_lo_ref[...]
    xh = x_hi_ref[...]
    g = lo.shape[0] // gpb          # group width (static, lane-aligned)
    acc = acc_ref[...]
    for gi in range(gpb):
        row = k_step * gpb + gi
        sl = slo_ref[pl.ds(row, 1), :][0]
        sh = shi_ref[pl.ds(row, 1), :][0]
        yl = jax.lax.dot_general(
            xl[:, gi * g:(gi + 1) * g], lo[gi * g:(gi + 1) * g, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        yh = jax.lax.dot_general(
            xh[:, gi * g:(gi + 1) * g], hi[gi * g:(gi + 1) * g, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + yl * sl[None, :] + yh * sh[None, :]
    acc_ref[...] = acc

    @pl.when(k_step == pl.num_programs(1) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _blocks(K2: int, gh: int, N: int):
    """(bk, bn) or None if the shapes don't tile the Mosaic lane grid."""
    if gh == 0 or K2 % gh:
        return None
    g = K2 // gh
    if g % 128:
        return None
    bn = next((b for b in (512, 256, 128) if N % b == 0), None)
    if bn is None:
        return None
    d = next(d for d in (8, 4, 2, 1) if gh % d == 0)
    return g * d, bn


def supported(q4, s) -> bool:
    return (
        q4.ndim == 2
        and s.shape[0] % 2 == 0
        and _blocks(q4.shape[0], s.shape[0] // 2, q4.shape[1]) is not None
    )


def int4_matmul_pallas(x, q4, s, out_dtype=None, interpret: bool = False):
    """x: [M, K] float; q4: [K/2, N] nibble-packed int8 (half-split layout,
    quantize_leaf_int4); s: [K/G, N] f32, lo-half groups first.  Returns
    [M, N] in ``out_dtype`` (default x.dtype)."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    K2, N = q4.shape
    assert K == 2 * K2, (x.shape, q4.shape)
    gh = s.shape[0] // 2
    bk, bn = _blocks(K2, gh, N)
    gpb = bk // (K2 // gh)

    Mp = -(-M // 8) * 8  # 8-sublane minimum; pad rows cost nothing at decode M
    xp = x if Mp == M else jnp.pad(x, ((0, Mp - M), (0, 0)))
    x_lo, x_hi = xp[:, :K2], xp[:, K2:]
    s_lo, s_hi = s[:gh], s[gh:]

    x_spec = pl.BlockSpec((Mp, bk), lambda n, k: (0, k))
    s_spec = pl.BlockSpec((gh, bn), lambda n, k: (0, n))
    from functools import partial as _partial

    y = pl.pallas_call(
        _partial(_kernel, gpb=gpb),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(N // bn, K2 // bk),
        in_specs=[
            x_spec, x_spec,
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            s_spec, s_spec,
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)] if pltpu else [],
        interpret=interpret,
    )(x_lo, x_hi, q4, s_lo, s_hi)
    return y[:M]


def use_pallas_int4() -> bool:
    """Default-on on TPU; MMU_INT4_PALLAS=0 is the kill switch.  (CPU tests
    drive int4_matmul_pallas directly with interpret=True.)"""
    if os.environ.get("MMU_INT4_PALLAS") == "0":
        return False
    return jax.default_backend() == "tpu"
