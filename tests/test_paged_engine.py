"""Paged KV cache through the serving engine (serve/engine.py
``page_size`` / ``kv_pool_pages``): a shared page pool + host block tables
replaces the dense [slots × max_len] slab.  Every stream must stay
TOKEN-IDENTICAL to the dense engine (and hence to solo greedy_generate),
across eos churn, speculation, sampling, prefix sharing, chunked prefill,
VLMs, and a pool tight enough that admission control actually queues.

Beyond-reference: the reference has no serving layer (HF batch generate,
mm/eval.py:126-133); this is the vLLM-style production memory layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.serve import ServingEngine

from tests.test_serve import _expected, tiny_decoder


def _engine(cfg, params, **kw):
    base = dict(
        num_slots=2, max_len=256, chunk=4, bucket_multiple=16,
        pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    base.update(kw)
    return ServingEngine(params, cfg, kw.pop("kind", "llama"), **base)


def test_paged_matches_dense_mixed_lengths():
    """6 requests, 2 slots, page 16: every stream equals solo greedy."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    engine = _engine(cfg, params, page_size=16)
    specs = [(5, 6), (11, 3), (33, 9), (14, 5), (8, 7), (21, 4)]
    reqs = []
    for plen, max_new in specs:
        prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
        reqs.append((engine.submit(prompt, max_new), prompt, max_new))
    engine.drain([r for r, _, _ in reqs])
    for req, prompt, max_new in reqs:
        np.testing.assert_array_equal(
            np.asarray(req.tokens), _expected(params, cfg, prompt, max_new),
            err_msg=f"plen={len(prompt)}")
    # after a full drain every non-prefix page is back in the pool
    st = engine.stats()
    assert st["pool_pages_used"] == 0
    assert st["pool_pages"] == 2 * (engine.smax // 16)


def test_tight_pool_queues_and_completes():
    """A pool far smaller than slots × max_len forces admission control:
    requests wait for retirements, everything still completes exactly."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    # each request needs ceil((32 + 8)/16) = 3 pages; pool of 7 usable
    # pages can hold at most 2 in flight
    engine = _engine(cfg, params, num_slots=4, page_size=16, kv_pool_pages=8)
    reqs = []
    for _ in range(5):
        prompt = rng.integers(3, cfg.vocab_size, 20).tolist()
        reqs.append((engine.submit(prompt, 8), prompt))
    engine.drain([r for r, _ in reqs])
    for req, prompt in reqs:
        np.testing.assert_array_equal(
            np.asarray(req.tokens), _expected(params, cfg, prompt, 8))
    assert engine.stats()["pool_pages_used"] == 0


def test_paged_eos_retirement_recycles_pages():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, cfg.vocab_size, 9).tolist()
    free = _expected(params, cfg, prompt, 10)
    eos = int(free[4])
    engine = _engine(cfg, params, num_slots=1, page_size=16,
                     kv_pool_pages=4, eos_token_id=eos)
    reqs = [engine.submit(prompt, 10),
            engine.submit(rng.integers(3, cfg.vocab_size, 6).tolist(), 5)]
    engine.drain(reqs)

    def until_eos(stream):
        stream = [int(t) for t in stream]
        return stream[: stream.index(eos)] if eos in stream else stream

    np.testing.assert_array_equal(np.asarray(reqs[0].tokens), until_eos(free))
    np.testing.assert_array_equal(
        np.asarray(reqs[1].tokens),
        until_eos(_expected(params, cfg, reqs[1].prompt_ids, 5, eos=eos)))
    assert engine.stats()["pool_pages_used"] == 0


def test_paged_speculative_identical():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    prompts = [(motif * 6)[:27], rng.integers(3, cfg.vocab_size, 12).tolist()]
    dense = _engine(cfg, params, speculate_k=3, spec_ref_len=16)
    paged = _engine(cfg, params, speculate_k=3, spec_ref_len=16, page_size=16)
    outs = []
    for e in (dense, paged):
        rs = [e.submit(p, 9, draft_ref=p[:10]) for p in prompts]
        e.drain(rs)
        outs.append([list(r.tokens) for r in rs])
    assert outs[0] == outs[1]
    assert paged.stats()["pool_pages_used"] == 0


def test_paged_sampling_identical():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (7, 19)]
    dense = _engine(cfg, params, temperature=0.8, top_k=12)
    paged = _engine(cfg, params, temperature=0.8, top_k=12, page_size=16)
    outs = []
    for e in (dense, paged):
        rs = [e.submit(p, 8, sample_seed=100 + i) for i, p in enumerate(prompts)]
        e.drain(rs)
        outs.append([list(r.tokens) for r in rs])
    assert outs[0] == outs[1]


def test_paged_prefix_pages_shared_zero_copy():
    """Prefix caching under paging: N concurrent requests reference the
    SAME prefix pages — pool accounting shows the prefix held once, and
    streams equal the dense prefix engine's."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(5)
    sys_prompt = rng.integers(3, cfg.vocab_size, 30).tolist()  # 2 pages
    suffixes = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (5, 9, 13)]

    dense = _engine(cfg, params, num_slots=3)
    paged = _engine(cfg, params, num_slots=3, page_size=16)
    outs = []
    for e in (dense, paged):
        pid = e.register_prefix(sys_prompt)
        rs = [e.submit(s, 7, prefix=pid) for s in suffixes]
        e.drain(rs)
        outs.append([list(r.tokens) for r in rs])
    assert outs[0] == outs[1]
    # prefix pinned once: 30 tokens -> bucket 32 -> 2 pages, regardless of
    # how many requests used it
    assert paged.stats()["pool_pages_used"] == 2
    # and each request's own allocation excluded those 2 pages:
    # suffix bucket 16 + max_new 7 -> 2 own pages per request while live
    assert paged.NP - 1 == 3 * (paged.smax // 16)


def test_paged_chunked_prefill():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(6)
    long = rng.integers(3, cfg.vocab_size, 75).tolist()
    short = rng.integers(3, cfg.vocab_size, 6).tolist()
    engine = _engine(cfg, params, page_size=16, prefill_chunk=16)
    r1 = engine.submit(short, 12)
    r2 = engine.submit(long, 6)
    engine.drain([r1, r2])
    np.testing.assert_array_equal(
        np.asarray(r1.tokens), _expected(params, cfg, short, 12))
    np.testing.assert_array_equal(
        np.asarray(r2.tokens), _expected(params, cfg, long, 6))
    assert engine.stats()["prefill_chunks"] >= 4
    assert engine.stats()["pool_pages_used"] == 0


def test_paged_llava_pixels():
    from multimodal_unlearning_tpu.models import llava as llava_mod

    arch = get_model_identifiers("tiny-llava-test").arch
    mcfg = llava_mod.LlavaConfig.from_registry(arch)
    params = llava_mod.init_params(mcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    n_img = mcfg.num_image_tokens
    img = rng.normal(
        size=(mcfg.vision.image_size, mcfg.vision.image_size, 3)).astype(np.float32)
    prompt = [mcfg.image_token_id] * n_img + rng.integers(
        3, mcfg.decoder.vocab_size, 11).tolist()

    def run(page):
        e = ServingEngine(
            params, mcfg, "llava", num_slots=1, max_len=256, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            page_size=page)
        return e.drain([e.submit(prompt, 6, pixel_values=img)])

    assert run(16) == run(0)


def test_paged_int8_cache():
    """int8 paged pool: per-position scales ride their own page planes;
    streams equal the dense int8-cache engine's."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(8)
    prompts = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (9, 22)]

    def run(page):
        e = _engine(cfg, params, cache_dtype=jnp.int8, page_size=page)
        rs = [e.submit(p, 7) for p in prompts]
        e.drain(rs)
        return [list(r.tokens) for r in rs]

    assert run(16) == run(0)


def test_bad_page_size_rejected():
    cfg, params = tiny_decoder()
    with pytest.raises(ValueError, match="page_size"):
        _engine(cfg, params, page_size=48)


def test_oversize_request_rejected_up_front():
    cfg, params = tiny_decoder()
    engine = _engine(cfg, params, page_size=16, kv_pool_pages=3)
    with pytest.raises(ValueError, match="pages"):
        engine.submit(list(range(3, 40)), 60)


def test_paged_gpt_family():
    """The paged write/read helpers are shared by the gpt decoder families
    (models/gpt_decoder.py routes through llama's cache helpers)."""
    from multimodal_unlearning_tpu.models import gpt_decoder

    rng = np.random.default_rng(9)
    gcfg = gpt_decoder.GptConfig.from_registry(dict(
        decoder="neox", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rotary_pct=0.25,
    ))
    gparams = gpt_decoder.init_params(gcfg, jax.random.PRNGKey(0))
    prompts = [rng.integers(3, gcfg.vocab_size, n).tolist() for n in (9, 21)]

    def run(page):
        e = ServingEngine(
            gparams, gcfg, "neox", num_slots=2, max_len=128, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            page_size=page)
        rs = [e.submit(p, 7) for p in prompts]
        e.drain(rs)
        return [list(r.tokens) for r in rs]

    assert run(16) == run(0)


def test_paged_tensor_parallel_matches_unsharded():
    """Paged engine under a tensor=2 mesh: the pool shards on the head dim
    (or GSPMD partitions the gather path) and streams stay identical."""
    from multimodal_unlearning_tpu.cli.common import apply_tensor_parallel
    from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(10)
    specs = [(6, 5), (10, 4), (4, 6)]
    prompts = [rng.integers(3, cfg.vocab_size, p).tolist() for p, _ in specs]

    def run(mesh, p, page):
        eng = ServingEngine(
            p, cfg, "llama", num_slots=2, max_len=128, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh,
            page_size=page)
        reqs = [eng.submit(pr, m) for pr, (_, m) in zip(prompts, specs)]
        return eng.drain(reqs)

    base = run(None, params, 0)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, tensor=2))
    tp_params = apply_tensor_parallel(
        mesh, cfg, "llama", jax.tree.map(jnp.asarray, params))
    with mesh:
        tp = run(mesh, tp_params, 16)
    assert tp == base


def test_prefix_overflow_raises_cleanly():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(11)
    engine = _engine(cfg, params, page_size=16, kv_pool_pages=3)  # 2 usable
    with pytest.raises(ValueError, match="prefix needs"):
        engine.register_prefix(rng.integers(3, cfg.vocab_size, 40).tolist())


def test_paged_spec_engine_through_pallas_chunk_kernel(monkeypatch):
    """Paged + speculative engine streams token-identical through the
    block-table-aware verify-chunk kernel (interpret mode)."""
    from functools import partial

    import multimodal_unlearning_tpu.ops.decode_attention as da

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(12)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    prompts = [(motif * 6)[:27], rng.integers(3, cfg.vocab_size, 11).tolist()]

    def run():
        e = _engine(cfg, params, speculate_k=3, spec_ref_len=16, page_size=16)
        rs = [e.submit(p, 8, draft_ref=p[:10]) for p in prompts]
        e.drain(rs)
        return [list(r.tokens) for r in rs]

    base = run()
    orig = da.chunk_decode_attention
    monkeypatch.setattr(da, "chunk_decode_attention",
                        partial(orig, impl="pallas", interpret=True))
    assert run() == base


def test_on_demand_growth_preempts_and_stays_exact():
    """r5: admission reserves only the prompt bucket (+margin); decode pages
    are allocated on demand and pool exhaustion preempts the youngest slot
    (recompute-style, vLLM semantics).  Worst-case per request here is 5
    pages (bucket 32 prompt + 40 budget), so 4 slots x 5 = 20 > 12 usable
    pages — the eager-reservation engine (r4) could only admit 2 slots,
    and a growth-only engine would corrupt streams when the pool runs dry.
    Every stream must still equal solo greedy, preempted ones included."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(21)
    engine = _engine(cfg, params, num_slots=4, page_size=16,
                     kv_pool_pages=13)  # 12 usable
    reqs = []
    for _ in range(6):
        prompt = rng.integers(3, cfg.vocab_size, 20).tolist()
        reqs.append((engine.submit(prompt, 40), prompt))
    engine.drain([r for r, _ in reqs])
    st = engine.stats()
    assert st["preemptions"] >= 1, "pool pressure must trigger preemption"
    assert st["pool_pages_used"] == 0
    for req, prompt in reqs:
        np.testing.assert_array_equal(
            np.asarray(req.tokens), _expected(params, cfg, prompt, 40),
            err_msg=f"prompt={prompt[:4]}...")


def test_on_demand_growth_speculative_exact():
    """Growth margins account for the verify chunk's K+1-column overhang:
    spec + tight pool + preemption still emits exactly greedy's tokens."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(22)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    engine = _engine(cfg, params, num_slots=3, page_size=16,
                     kv_pool_pages=16, speculate_k=3, spec_ref_len=16)
    reqs = []
    for i in range(5):
        prompt = ((motif * 6)[: 20 + i] if i % 2 == 0
                  else rng.integers(3, cfg.vocab_size, 18).tolist())
        reqs.append((engine.submit(prompt, 32, draft_ref=prompt[:10]), prompt))
    engine.drain([r for r, _ in reqs])
    assert engine.stats()["pool_pages_used"] == 0
    for req, prompt in reqs:
        np.testing.assert_array_equal(
            np.asarray(req.tokens), _expected(params, cfg, prompt, 32),
            err_msg=f"plen={len(prompt)}")
