"""Attribute the paged-KV per-dispatch slowdown (VERDICT r5 ask #1).

r5 serve_bench with the occupancy counters shows the paged regression is NOT
admission anymore: paged80 runs at dense occupancy (0.75 vs 0.76) yet takes
827 ms/dispatch vs dense's 369 ms.  The paged attention kernel itself is only
+26% (kernel_onchip_check.log: 2.17 vs 1.72 ms at L4/B8) — something else in
the paged decode-chunk program costs ~25 ms/step.

This bench builds BOTH engines at the 7B serve op point, keeps all 8 slots
live (equal long budgets — occupancy 1.0 by construction), times steady-state
dispatches, and parses a jax.profiler trace of each program into op buckets
(profile_step._bucket) so the delta lands on named ops.

  python examples/paged_dispatch_profile.py [family] [outjson]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def run_leg(mcfg, params, paged: bool, trace_dir=None, n_timed=6):
    import gc

    from multimodal_unlearning_tpu.serve import ServingEngine

    gc.collect()
    eng = ServingEngine(
        params, mcfg, "llava", num_slots=8, max_len=1024, chunk=16,
        bucket_multiple=128, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        page_size=128 if paged else 0,
        # full dense-equivalent pool: isolates the per-step program cost
        # from pool-pressure effects (preemption, admission)
        kv_pool_pages=8 * (1024 // 128) + 1 if paged else None,
    )
    rng = np.random.default_rng(0)
    n_img = mcfg.num_image_tokens
    img_size = mcfg.vision.image_size
    reqs = []
    for _ in range(8):
        ids = [mcfg.image_token_id] * n_img + rng.integers(
            10, mcfg.decoder.vocab_size - 70, 24).tolist()
        img = rng.normal(size=(img_size, img_size, 3)).astype(np.float32)
        # equal LONG budgets: every slot stays live for the whole window
        reqs.append(eng.submit(ids, 280, pixel_values=img))
    # admit everything + warm the decode program: run a few engine steps
    for _ in range(4):
        eng.step()
    st0 = eng.stats()
    t0 = time.perf_counter()
    for _ in range(n_timed):
        eng.step()
    # one synced fetch so timing covers real device completion
    jax.block_until_ready(eng._state["cache"]["k"])
    dt = time.perf_counter() - t0
    disp = eng.stats()["dispatches"] - st0["dispatches"]
    ms = 1e3 * dt / max(disp, 1)

    summary = None
    if trace_dir:
        from profile_step import summarize_xplane

        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                eng.step()
            jax.block_until_ready(eng._state["cache"]["k"])
        parsed = summarize_xplane(trace_dir)
        if parsed:
            tot = parsed["total_device_s"]
            summary = {
                "buckets_ms_per_dispatch": {
                    k: round(v / 3 * 1e3, 1)
                    for k, v in sorted(parsed["buckets"].items(), key=lambda kv: -kv[1])
                },
                "device_ms_per_dispatch": round(tot / 3 * 1e3, 1),
                "top_ops_ms_per_dispatch": [
                    {"op": op, "bucket": b, "ms": round(t / 3 * 1e3, 2)}
                    for op, (b, t) in sorted(
                        parsed["per_op"].items(), key=lambda kv: -kv[1][1])[:20]
                ],
            }
    for r in reqs:
        eng.cancel(r)
    return ms, summary


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "llava"
    out = sys.argv[2] if len(sys.argv) > 2 else "examples/serve_bench/paged_attrib.json"

    from serve_bench import build

    mcfg, params = build(family)
    ms_dense, sum_dense = run_leg(mcfg, params, False, "/tmp/ppd_dense")
    print(f"dense: {ms_dense:.0f} ms/dispatch", flush=True)
    ms_paged, sum_paged = run_leg(mcfg, params, True, "/tmp/ppd_paged")
    print(f"paged: {ms_paged:.0f} ms/dispatch", flush=True)

    payload = {
        "family": family, "slots": 8, "chunk": 16, "max_len": 1024,
        "occupancy": "1.0 by construction (equal long budgets, full pool)",
        "dense_ms_per_dispatch": round(ms_dense, 1),
        "paged_ms_per_dispatch": round(ms_paged, 1),
        "dense_profile": sum_dense,
        "paged_profile": sum_paged,
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items()
                      if not k.endswith("_profile")}, indent=2))
    for tag, s in (("dense", sum_dense), ("paged", sum_paged)):
        if s:
            print(f"-- {tag} buckets (ms/dispatch):")
            for k, v in s["buckets_ms_per_dispatch"].items():
                print(f"   {k:40s} {v:8.1f}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
