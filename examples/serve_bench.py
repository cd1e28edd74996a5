"""Serving benchmark: continuous batching vs batch generate (one chip).

The reference serves checkpoints through HF ``model.generate`` batch by
batch: every admitted batch decodes until its LONGEST answer finishes, so
short answers burn idle decode steps, and queued requests wait for the
whole batch.  The serving engine (serve/engine.py) retires each slot the
step its request finishes and refills it from the queue immediately.

Workload: LLaVA-7B-arch requests with a shared prompt length and a skewed
answer-length distribution (most answers short, a few long — the shape of
real QA traffic).  Both paths run the same int8-quantized decoder, flash
decode kernel, and greedy argmax; the comparison is pure scheduling.

  python examples/serve_bench.py [n_requests] [slots] [model_family]

Prints one line per mode: useful tokens/s (sum of ACTUALLY EMITTED tokens
over wall-clock, compile excluded via a warmup drain) and the speedup.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(family):
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import llava
    from multimodal_unlearning_tpu.utils.quantize import quantize_tree_inplace

    model_cfg = get_model_identifiers(family)
    mcfg = build_model_config(model_cfg)
    params = llava.init_params(mcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    # leaf-by-leaf destructive quantize: a whole-tree quantize keeps bf16
    # (13.5 GB) + int8 (7 GB) alive at once and OOMs the 16 GB chip
    quantize_tree_inplace(params["language_model"])
    return mcfg, params


def make_requests(mcfg, n, seed=0):
    """Shared prompt shape (CLEAR sample: image span + question), skewed
    answer budgets: 75% short (8-48), 25% long (200-300)."""
    rng = np.random.default_rng(seed)
    n_img = mcfg.num_image_tokens
    img_size = mcfg.vision.image_size
    reqs = []
    for _ in range(n):
        q_len = int(rng.integers(12, 40))
        ids = [mcfg.image_token_id] * n_img + rng.integers(
            10, mcfg.decoder.vocab_size - 70, q_len).tolist()
        budget = int(rng.integers(8, 48)) if rng.random() < 0.75 else int(rng.integers(200, 300))
        img = rng.normal(size=(img_size, img_size, 3)).astype(np.float32)
        reqs.append((ids, budget, img))
    return reqs


def run_engine(mcfg, params, requests, slots, chunk=16, speculate_k=0,
               page_size=0, pool_frac=1.0, draft_refs=None):
    import gc

    from multimodal_unlearning_tpu.serve import ServingEngine

    # free the PREVIOUS leg's engine (KV slabs are GB-scale at 7B; request
    # object cycles keep them alive past the natural scope exit)
    gc.collect()

    slack = speculate_k + 1 if speculate_k else 0
    # submit checks BUCKETED prompt length + budget (+ spec slack)
    sp_max = -(-max(len(r[0]) for r in requests) // 128) * 128
    max_len = -(-(sp_max + 300 + slack) // 128) * 128
    pool = None
    if page_size:
        dense_pages = slots * (-(-max_len // 128) * 128 // page_size)
        pool = max(int(dense_pages * pool_frac), 2) + 1
    eng = ServingEngine(
        params, mcfg, "llava", num_slots=slots, max_len=max_len, chunk=chunk,
        bucket_multiple=128, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        speculate_k=speculate_k, page_size=page_size, kv_pool_pages=pool,
        spec_ref_len=384 if draft_refs else 128,
    )
    # warmup: compile the prefill bucket + the decode chunk
    w = [eng.submit(requests[0][0], 2, pixel_values=requests[0][2]),
         eng.submit(requests[1][0], 2, pixel_values=requests[1][2])]
    eng.drain(w)

    drefs = draft_refs or [None] * len(requests)
    st0 = eng.stats()  # warmup baseline — counters below are measured-run only
    t0 = time.perf_counter()
    live = [eng.submit(ids, budget, pixel_values=img, draft_ref=dref)
            for (ids, budget, img), dref in zip(requests, drefs)]
    outs = eng.drain(live)
    dt = time.perf_counter() - t0
    toks = sum(len(t) for t in outs)
    lat = sorted(r.done_t - r.submit_t for r in live)
    st_all = eng.stats()
    # engine-counter attribution (paged60 regression triage): occupancy is
    # the fraction of dispatched (step, slot) cells that carried a live
    # request — low occupancy = admission/scheduling loss; high occupancy
    # with low tok/s = the per-step program itself is slower
    disp = st_all["dispatches"] - st0["dispatches"]
    rounds = st_all["live_rounds"] - st0["live_rounds"]
    cells = max(disp * chunk * slots, 1)
    stats = {
        "dispatches": int(disp),
        "prefills": int(st_all["prefills"] - st0["prefills"]),
        "live_rounds": int(rounds),
        "occupancy": round(rounds / cells, 3),
        "ms_per_dispatch": round(1e3 * dt / max(disp, 1), 1),
    }
    print(f"  engine: {stats['dispatches']} dispatches x chunk {chunk}, "
          f"occupancy {stats['occupancy']:.2f}, "
          f"{stats['ms_per_dispatch']:.0f} ms/dispatch "
          f"({stats['prefills']} prefills in-band)", flush=True)
    if speculate_k:
        # baseline-subtracted like every other counter here — the lifetime
        # tokens_per_round would fold the 2 warmup requests into acceptance
        stats["tokens_per_round"] = round(
            (st_all["emitted"] - st0["emitted"])
            / max(st_all["live_rounds"] - st0["live_rounds"], 1), 3)
        print(f"  spec{speculate_k} acceptance: "
              f"{stats['tokens_per_round']:.2f} tok/round", flush=True)
    if page_size:
        st = eng.stats()
        dense_pages = slots * (eng.smax // page_size)
        stats["pool_pages"] = int(st["pool_pages"])
        stats["pool_pages_peak"] = int(st["pool_pages_peak"])
        stats["pool_frac_of_dense"] = round(st["pool_pages"] / dense_pages, 3)
        stats["peak_frac_of_dense"] = round(st["pool_pages_peak"] / dense_pages, 3)
        print(f"  paged pool: {st['pool_pages']} pages "
              f"({st['pool_pages']/dense_pages:.0%} of dense), "
              f"peak used {st['pool_pages_peak']} "
              f"({st['pool_pages_peak']/dense_pages:.0%} of dense KV memory)",
              flush=True)
    return toks, dt, lat, outs, stats


def run_batched(mcfg, params, requests, batch_size):
    """Reference-style: fixed batches, every batch decodes to its max budget,
    outputs sliced per row afterwards (emitted = each row's own budget)."""
    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate

    def one_batch(rows, max_new):
        sp = -(-max(len(r[0]) for r in rows) // 128) * 128
        ids = np.zeros((len(rows), sp), np.int32)
        mask = np.zeros((len(rows), sp), np.int32)
        for i, (p, _, _) in enumerate(rows):
            ids[i, sp - len(p):] = p
            mask[i, sp - len(p):] = 1
        pix = jnp.asarray(np.stack([r[2] for r in rows]), jnp.bfloat16)
        out = greedy_generate(
            params, mcfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=max_new, pad_token_id=0, eos_token_id=None,
            pixel_values=pix, is_vlm=True,
            cache_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        )
        return int(np.asarray(out)[0, -1])  # sync

    # two decode-length buckets only (48 short / 304 long), both warmed —
    # distinct decode lengths would each recompile mid-timing otherwise
    def bucket_new(max_new):
        return 48 if max_new <= 48 else 304

    one_batch(requests[:batch_size], 304)
    one_batch(requests[:batch_size], 48)

    t0 = time.perf_counter()
    toks = 0
    lat = []
    for i in range(0, len(requests), batch_size):
        rows = requests[i: i + batch_size]
        one_batch(rows, bucket_new(max(r[1] for r in rows)))
        # every request in the batch (and all earlier batches) waits until
        # this batch drains — the per-request latency of batch serving
        lat.extend([time.perf_counter() - t0] * len(rows))
        toks += sum(r[1] for r in rows)
    dt = time.perf_counter() - t0
    return toks, dt, sorted(lat)


def run_prefix_leg(mcfg, params, slots, pct, n=32):
    """Shared-context workload: N questions about ONE image (+preamble) —
    prefix caching prefills the image span once instead of N times."""
    from multimodal_unlearning_tpu.serve import ServingEngine

    rng = np.random.default_rng(1)
    n_img = mcfg.num_image_tokens
    img = rng.normal(size=(mcfg.vision.image_size, mcfg.vision.image_size, 3)).astype(np.float32)
    preamble = [mcfg.image_token_id] * n_img + rng.integers(
        10, mcfg.decoder.vocab_size - 70, 24).tolist()
    cases = [(rng.integers(10, mcfg.decoder.vocab_size - 70,
                           int(rng.integers(12, 40))).tolist(),
              int(rng.integers(8, 48))) for _ in range(n)]
    p_bucket = -(-len(preamble) // 128) * 128
    max_len = -(-(p_bucket + 128 + 48) // 128) * 128

    import gc

    gc.collect()

    def eng():
        return ServingEngine(
            params, mcfg, "llava", num_slots=slots, max_len=max_len, chunk=16,
            bucket_multiple=128, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        )

    for use_prefix in (False, True):
        gc.collect()
        e = eng()
        pid = e.register_prefix(preamble, pixel_values=img) if use_prefix else None
        # warmup compile
        w = (e.submit(cases[0][0], 2, prefix=pid) if use_prefix
             else e.submit(preamble + cases[0][0], 2, pixel_values=img))
        e.drain([w])
        t0 = time.perf_counter()
        if use_prefix:
            live = [e.submit(q, m, prefix=pid) for q, m in cases]
        else:
            live = [e.submit(preamble + q, m, pixel_values=img) for q, m in cases]
        outs = e.drain(live)
        dt = time.perf_counter() - t0
        toks = sum(len(t) for t in outs)
        lat = sorted(r.done_t - r.submit_t for r in live)
        tag = "prefix-cached" if use_prefix else "full-prefill "
        print(f"{tag} B={slots}: {toks} useful tokens in {dt:6.1f}s "
              f"= {toks / dt:6.1f} tok/s   "
              f"latency p50 {pct(lat, 50):5.2f}s p95 {pct(lat, 95):5.2f}s", flush=True)


def main():
    import json

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    family = sys.argv[3] if len(sys.argv) > 3 else "llava"
    mcfg, params = build(family)
    requests = make_requests(mcfg, n)

    def pct(lat, p):
        return lat[min(int(p / 100 * len(lat)), len(lat) - 1)]

    rows = []

    def record(mode, toks, dt, lat, **extra):
        rows.append({
            "mode": mode, "useful_tokens": toks, "wall_s": round(dt, 2),
            "tok_per_s": round(toks / dt, 1),
            "latency_p50_s": round(pct(lat, 50), 2),
            "latency_p95_s": round(pct(lat, 95), 2),
            "speedup_vs_batched": round(rows[0]["wall_s"] / dt, 2) if rows else 1.0,
            **extra,
        })

    toks_b, dt_b, lat_b = run_batched(mcfg, params, requests, slots)
    record("batched", toks_b, dt_b, lat_b)
    print(f"batched    bs={slots}: {toks_b} useful tokens in {dt_b:6.1f}s "
          f"= {toks_b / dt_b:6.1f} tok/s   "
          f"latency p50 {pct(lat_b, 50):5.1f}s p95 {pct(lat_b, 95):5.1f}s", flush=True)

    toks_e, dt_e, lat_e, outs_e, st_e = run_engine(mcfg, params, requests, slots)
    record("continuous", toks_e, dt_e, lat_e, **st_e)
    print(f"continuous B={slots}: {toks_e} useful tokens in {dt_e:6.1f}s "
          f"= {toks_e / dt_e:6.1f} tok/s   "
          f"latency p50 {pct(lat_e, 50):5.1f}s p95 {pct(lat_e, 95):5.1f}s   "
          f"({dt_b / dt_e:4.2f}x)", flush=True)

    # opt-in speculative legs: trailing "spec<K>" args, e.g. ... llava spec4.
    # Each request's draft corpus is seeded with its own prior answer (the
    # continuous leg's output) — the engine's documented regeneration/cached-
    # answer scenario — so this measures the verify machinery at HIGH
    # acceptance; realistic-acceptance numbers come from the finetuned-model
    # eval workload (examples/e2e_7b_pipeline.py / BASELINE.md)
    spec_drafts = [[int(t) for t in o] for o in outs_e]
    for arg in sys.argv[4:]:
        if arg.startswith("speccold"):
            # cold-draft lower bound: NO draft_ref seeding — the proposer
            # falls back to 2-gram lookup over the slot's own prompt+history
            # (the acceptance a forgotten/never-seen answer actually gets)
            k = int(arg[8:])
            toks_s, dt_s, lat_s, _, st = run_engine(
                mcfg, params, requests, slots, speculate_k=k, draft_refs=None)
            record(f"cont+speccold{k}", toks_s, dt_s, lat_s,
                   drafts="none (prompt+history lookup only, cold)",
                   caveat="random-init weights decode into repetitive loops "
                          "the history lookup predicts near-perfectly, so "
                          "this leg's acceptance is NOT a realistic cold "
                          "lower bound — the realistic number is the e2e "
                          "pipeline's spec eval on a trained model "
                          "(examples/e2e_7b/pipeline.json)", **st)
            print(f"cont+speccold{k} B={slots}: {toks_s} useful tokens in {dt_s:6.1f}s "
                  f"= {toks_s / dt_s:6.1f} tok/s   "
                  f"latency p50 {pct(lat_s, 50):5.1f}s p95 {pct(lat_s, 95):5.1f}s   "
                  f"({dt_b / dt_s:4.2f}x)", flush=True)
        elif arg.startswith("spec"):
            k = int(arg[4:])
            toks_s, dt_s, lat_s, _, st = run_engine(
                mcfg, params, requests, slots, speculate_k=k,
                draft_refs=spec_drafts)
            record(f"cont+spec{k}", toks_s, dt_s, lat_s,
                   drafts="cached-prior-answer (high acceptance)", **st)
            print(f"cont+spec{k} B={slots}: {toks_s} useful tokens in {dt_s:6.1f}s "
                  f"= {toks_s / dt_s:6.1f} tok/s   "
                  f"latency p50 {pct(lat_s, 50):5.1f}s p95 {pct(lat_s, 95):5.1f}s   "
                  f"({dt_b / dt_s:4.2f}x)", flush=True)
        elif arg == "prefix":
            run_prefix_leg(mcfg, params, slots, pct)
        elif arg.startswith("paged"):
            # "paged" or "paged60" = pool capped at 60% of the dense layout;
            # throughput should hold while KV memory drops to the workload's
            # actual footprint (skewed budgets leave dense slabs mostly empty)
            frac = int(arg[5:]) / 100 if len(arg) > 5 else 0.6
            toks_p, dt_p, lat_p, _, st = run_engine(
                mcfg, params, requests, slots, page_size=128, pool_frac=frac)
            record(f"cont+paged{int(frac * 100)}", toks_p, dt_p, lat_p, **st)
            print(f"cont+paged B={slots}: {toks_p} useful tokens in {dt_p:6.1f}s "
                  f"= {toks_p / dt_p:6.1f} tok/s   "
                  f"latency p50 {pct(lat_p, 50):5.1f}s p95 {pct(lat_p, 95):5.1f}s   "
                  f"({dt_b / dt_p:4.2f}x)", flush=True)

    out = os.environ.get("MMU_SERVE_BENCH_OUT")
    if out:
        import jax as _jax

        payload = {
            "family": family, "n_requests": n, "slots": slots,
            "backend": _jax.default_backend(),
            "weights": "int8 (quantize_tree)",
            "workload": "shared CLEAR-shape prompts, 75% short (8-48) / "
                        "25% long (200-300) answer budgets",
            "legs": rows,
        }
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
