"""One-command Mosaic validation of the decode-path Pallas kernels on the
real chip: each kernel vs its XLA reference at serving-realistic shapes.

The paged kernels and the verify-chunk kernels are interpret-validated in
CI (tests/test_paged_attention.py, tests/test_attention.py); this script
is the ON-CHIP gate behind their auto-dispatch defaults.  It PASSED on a
real v5e (all dense+paged, bf16+int8 variants — see
examples/kernel_onchip_check.log), so the verify-chunk kernels now
dispatch by default on TPU; MMU_CHUNK_PALLAS=0 is the kill switch
(ops/decode_attention.py:chunk_decode_attention).  It also caught a real
Mosaic tiling bug interpret mode cannot see (the paged validity block
layout), so rerun it on hardware after any kernel change.

  python examples/kernel_onchip_check.py            # correctness
  python examples/kernel_onchip_check.py time       # + micro-timings

Timing methodology: value-fetch sync (BASELINE gotchas — block_until_ready
returns early through the axon proxy), second call onward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.ops.decode_attention import (
    chunk_decode_attention,
    decode_attention,
)
from multimodal_unlearning_tpu.ops.paged_attention import paged_decode_attention

# 7B-arch decode point: 32 layers is wasteful for a kernel check — 4 layers
# keeps the stacked-cache indexing real at 1/8 the HBM.  Off-TPU (interpret
# smoke) the grid shrinks: interpret mode runs one python call per grid cell
if jax.default_backend() == "tpu":
    L, B, Hq, Hkv, D = 4, 8, 32, 32, 128
    SMAX, PAGE = 1024, 128
else:
    L, B, Hq, Hkv, D = 2, 2, 4, 4, 128
    SMAX, PAGE = 256, 128
MP = SMAX // PAGE
C = 5  # speculate_k=4 verify chunk


def rep(name, got, want, tol=2e-2):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} max|Δ| = {err:.3e}")
    return ok


def timed(fn, *args, n=20):
    out = fn(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())  # compile + sync
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n * 1e3


def main():
    do_time = "time" in sys.argv[1:]
    interp = jax.default_backend() != "tpu"  # CPU smoke = interpret mode
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ok = True

    def dense_cache(int8):
        c = {"k": jnp.asarray(rng.normal(size=(L, B, Hkv, SMAX, D)), dt),
             "v": jnp.asarray(rng.normal(size=(L, B, Hkv, SMAX, D)), dt)}
        if int8:
            out = {}
            for key in ("k", "v"):
                x = np.asarray(c[key], np.float32)
                s = np.abs(x).max(-1, keepdims=True) / 127.0
                out[key] = jnp.asarray(np.round(x / np.maximum(s, 1e-12)), jnp.int8)
                out[key + "_s"] = jnp.asarray(s[..., 0][:, :, :, None, :])
            return out
        return c

    def to_paged(dense):
        NP = B * MP + 1
        ids = 1 + rng.permutation(NP - 1)[: B * MP]
        table = ids.reshape(B, MP).astype(np.int32)
        pool = {}
        for key, a in dense.items():
            a = np.asarray(a)
            if key in ("k", "v"):
                p = np.zeros((L, Hkv, NP, PAGE, D), a.dtype)
            else:
                p = np.zeros((L, Hkv, NP, 1, PAGE), a.dtype)
            for b in range(B):
                for j in range(MP):
                    sl = slice(j * PAGE, (j + 1) * PAGE)
                    if key in ("k", "v"):
                        p[:, :, table[b, j]] = a[:, b, :, sl, :]
                    else:
                        p[:, :, table[b, j], 0, :] = a[:, b, :, 0, sl]
            pool[key] = jnp.asarray(p)
        pool["table"] = jnp.asarray(table)
        return pool

    valid = np.zeros((B, SMAX), np.int32)
    lens = rng.integers(SMAX // 4, SMAX, B)
    for b, n in enumerate(lens):
        valid[b, :n] = 1
    valid = jnp.asarray(valid)
    q1 = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), dt)
    qC = jnp.asarray(rng.normal(size=(B, Hq, C, D)), dt)
    offC = jnp.asarray(lens, jnp.int32)

    for int8 in (False, True):
        tag = "int8" if int8 else "bf16"
        dense = dense_cache(int8)
        paged = to_paged(dense)

        # 1. dense flash decode (chip-proven round 2; sanity anchor)
        want = decode_attention(q1, dense, 1, valid, impl="xla")
        got = decode_attention(q1, dense, 1, valid, impl="pallas", interpret=interp)
        ok &= rep(f"dense flash decode [{tag}]", got, want)
        # 2. paged decode kernel
        gp = paged_decode_attention(q1, paged, 1, valid, impl="pallas", interpret=interp)
        ok &= rep(f"paged decode kernel [{tag}]", gp, want)
        # 3. dense verify-chunk kernel
        wc = chunk_decode_attention(qC, dense, 1, valid, offC, impl="xla")
        gc = chunk_decode_attention(qC, dense, 1, valid, offC, impl="pallas", interpret=interp)
        ok &= rep(f"dense verify-chunk kernel [{tag}]", gc, wc)
        # 4. paged verify-chunk kernel
        gpc = chunk_decode_attention(qC, paged, 1, valid, offC, impl="pallas", interpret=interp)
        ok &= rep(f"paged verify-chunk kernel [{tag}]", gpc, wc)

        if do_time:
            for name, fn, args in [
                ("decode xla", decode_attention, (q1, dense, 1, valid)),
                ("decode pallas", decode_attention, (q1, dense, 1, valid)),
                ("paged decode pallas", paged_decode_attention, (q1, paged, 1, valid)),
                ("chunk xla", chunk_decode_attention, (qC, dense, 1, valid, offC)),
                ("chunk pallas", chunk_decode_attention, (qC, dense, 1, valid, offC)),
                ("paged chunk pallas", chunk_decode_attention, (qC, paged, 1, valid, offC)),
            ]:
                impl = "pallas" if "pallas" in name else "xla"
                f = jax.jit(lambda *a, fn=fn, impl=impl: fn(*a, impl=impl))
                print(f"  {name:24s} [{tag}]  {timed(f, *args):7.3f} ms")

    # 5. W4A16 int4 matmul kernel (VERDICT r4 #4: interpret-only until now)
    # — decode shapes of the 7B op point: bs-8 single-token rows and the
    # speculative verify chunk against the attention out/gate projections
    from multimodal_unlearning_tpu.ops.int4_matmul import (
        int4_matmul_pallas, supported)
    from multimodal_unlearning_tpu.utils.quantize import (
        dequantize_leaf, quantize_leaf_int4)

    int4_shapes = ([(8, 4096, 4096), (8, 4096, 11008), (40, 4096, 4096)]
                   if jax.default_backend() == "tpu"
                   else [(8, 512, 512), (8, 512, 768)])
    for M, K, N in int4_shapes:
        w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
        qt = quantize_leaf_int4(w, group_size=128)
        assert supported(qt["q4"], qt["s"]), (K, N)
        x = jnp.asarray(rng.normal(size=(M, K)), dt)
        want = (x.astype(jnp.float32)
                @ dequantize_leaf(qt, jnp.float32)).astype(dt)
        got = int4_matmul_pallas(x, qt["q4"], qt["s"], dt, interpret=interp)
        # int4 values <= 7 are exact in bf16; error budget is the bf16
        # matmul rounding at |y| ~ sqrt(K)·|w| scale
        ok &= rep(f"int4 W4A16 kernel [{M}x{K}x{N}]", got, want,
                  tol=0.05 * float(jnp.max(jnp.abs(want))))
        if do_time:
            fp = jax.jit(lambda x, q, s: int4_matmul_pallas(x, q, s, dt))
            fx = jax.jit(lambda x, q, s: (
                x.astype(jnp.float32) @ dequantize_leaf({"q4": q, "s": s},
                                                        jnp.float32)
            ).astype(dt))
            print(f"  int4 pallas {M}x{K}x{N}:  {timed(fp, x, qt['q4'], qt['s']):7.3f} ms   "
                  f"xla-dequant: {timed(fx, x, qt['q4'], qt['s']):7.3f} ms")

    print("ALL PASS" if ok else "FAILURES above")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
