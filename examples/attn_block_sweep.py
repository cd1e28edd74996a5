"""Flash-attention block-size sweep at the bench operating shape.

Times fwd and fwd+bwd for (block_q, block_k) combinations so the kernel
defaults can be pinned empirically (VERDICT r1: fwd is VPU-bound — block
shape sets the softmax/matmul overlap).

Usage: python examples/attn_block_sweep.py [B H S D]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.ops.attention import flash_attention


def main():
    B, H, S, D = (int(x) for x in sys.argv[1:5]) if len(sys.argv) > 4 else (2, 32, 768, 128)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)

    combos = [
        (128, 128), (128, 256), (128, 384), (128, 768),
        (256, 256), (256, 384), (256, 768),
        (384, 384), (384, 768), (768, 256), (768, 768),
    ]

    REPS = 50  # chained inside ONE jit: per-call dispatch overhead through
    # the axon proxy (~2 ms) would otherwise swamp a ~0.15 ms kernel

    def bench(fn, *args):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # value-fetch sync
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / (n * REPS)

    for bq, bk in combos:
        if S % bq or S % bk:
            continue

        def attn(q, k, v):
            return flash_attention(q, k, v, mask, causal=True, block_q=bq, block_k=bk, impl="pallas")

        @jax.jit
        def fwd(q, k, v):
            def body(i, q):
                return attn(q, k, v)  # output feeds next q: serial dependency

            return jax.lax.fori_loop(0, REPS, body, q)

        @jax.jit
        def fwdbwd(q, k, v):
            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

            def body(i, q):
                l, g = jax.value_and_grad(loss)(q, k, v)
                return (q + 1e-6 * g).astype(q.dtype)

            return jax.lax.fori_loop(0, REPS, body, q)

        try:
            t_f = bench(fwd, q, k, v)
            t_fb = bench(fwdbwd, q, k, v)
            # causal attention FLOPs: 2 matmuls * B*H*S*S*D, halved by causality
            flops = 2 * 2 * B * H * S * S * D * 0.5
            print(
                f"bq={bq:4d} bk={bk:4d}  fwd {t_f*1e3:7.3f} ms ({flops/t_f/1e12:6.1f} TF/s)"
                f"   fwd+bwd {t_fb*1e3:7.3f} ms",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:4d} bk={bk:4d}  FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
