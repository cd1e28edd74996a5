"""Stop sequences + request cancellation in the serving engine.

Stop sequences are host-checked on the emitted stream (matched suffix
truncated away, OpenAI convention) and the slot is killed ON DEVICE so a
stopped request doesn't keep burning decode steps until its budget runs
out.  ``cancel`` aborts a request wherever it lives: queued, in a decode
slot, or mid chunked-prefill.

Beyond-reference serving-API parity; the reference's HF-generate eval loop
supports neither (mm/eval.py:126-133).
"""

import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.serve import ServingEngine

from tests.test_serve import _expected, tiny_decoder


def _engine(cfg, params, **kw):
    base = dict(
        num_slots=2, max_len=256, chunk=4, bucket_multiple=16,
        pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    base.update(kw)
    return ServingEngine(params, cfg, "llama", **base)


def test_stop_sequence_truncates_and_frees_slot():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, cfg.vocab_size, 9).tolist()
    free = [int(t) for t in _expected(params, cfg, prompt, 12)]
    # a 2-token stop the model WILL emit, whose FIRST occurrence ends at
    # position 7 (the stream is repetitive — pick a pair unique until then)
    stop = free[5:7]
    cut = next(i for i in range(len(free) - 1) if free[i: i + 2] == stop)

    engine = _engine(cfg, params, num_slots=1, logprobs=True)
    r1 = engine.submit(prompt, 12, stop=[stop])
    # a second request behind the single slot: it must still run exactly
    p2 = rng.integers(3, cfg.vocab_size, 6).tolist()
    r2 = engine.submit(p2, 5)
    engine.drain([r1, r2])
    assert r1.tokens == free[:cut]          # truncated BEFORE the stop
    assert len(r1.logprobs) == len(r1.tokens)
    np.testing.assert_array_equal(
        np.asarray(r2.tokens), _expected(params, cfg, p2, 5))


def test_stop_spanning_chunk_boundary():
    """A stop whose tokens straddle two decode-chunk dispatches still
    matches (the scan reaches back across the boundary)."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, cfg.vocab_size, 7).tolist()
    free = [int(t) for t in _expected(params, cfg, prompt, 12)]
    # chunk=4: first emission + 3 fill the first chunk; pick a stop across
    # tokens 3..5 (dispatch boundary after 4 = 1 insert + chunk 4... pick
    # a window that crosses a multiple of the chunk regardless)
    stop = free[3:6]
    engine = _engine(cfg, params, num_slots=1, chunk=4)
    req = engine.submit(prompt, 12, stop=[stop])
    engine.drain([req])
    assert req.tokens == free[:3]


def test_stop_first_token():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, cfg.vocab_size, 8).tolist()
    free = [int(t) for t in _expected(params, cfg, prompt, 6)]
    engine = _engine(cfg, params, num_slots=1)
    r1 = engine.submit(prompt, 6, stop=[[free[0]]])
    r2 = engine.submit(prompt, 6)  # same prompt, no stop: slot reuse works
    engine.drain([r1, r2])
    assert r1.tokens == []
    assert [int(t) for t in r2.tokens] == free


def test_stop_in_speculative_group():
    """Spec mode emits token GROUPS; a stop inside a group truncates
    mid-group and the stream matches the plain stopped run."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    prompt = (motif * 6)[:26]
    free = [int(t) for t in _expected(params, cfg, prompt, 10)]
    stop = free[5:7]
    spec = _engine(cfg, params, speculate_k=3, spec_ref_len=16)
    req = spec.submit(prompt, 10, draft_ref=prompt[:12], stop=[stop])
    spec.drain([req])
    assert req.tokens == free[:5]


def test_cancel_queued_and_live():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (8, 9, 10)]
    engine = _engine(cfg, params, num_slots=1, page_size=16)
    r0 = engine.submit(prompts[0], 20)
    r1 = engine.submit(prompts[1], 6)
    r2 = engine.submit(prompts[2], 6)
    engine.step()            # r0 admitted + decoding; r1/r2 queued
    assert engine.cancel(r1)  # cancel while queued
    engine.step()
    assert engine.cancel(r0)  # cancel while live (partial tokens kept)
    engine.drain([r2])
    assert r1.done and r1.tokens == []
    assert r0.done and 0 < len(r0.tokens) < 20
    want0 = [int(t) for t in _expected(params, cfg, prompts[0], 20)]
    assert r0.tokens == want0[: len(r0.tokens)]  # a clean prefix
    np.testing.assert_array_equal(
        np.asarray(r2.tokens), _expected(params, cfg, prompts[2], 6))
    assert engine.stats()["pool_pages_used"] == 0  # everything recycled
    assert engine.cancel(r2) is False  # already done


def test_cancel_chunked_prefill_job():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(5)
    long = rng.integers(3, cfg.vocab_size, 80).tolist()
    short = rng.integers(3, cfg.vocab_size, 5).tolist()
    engine = _engine(cfg, params, prefill_chunk=16, page_size=16)
    r_long = engine.submit(long, 8)
    engine.step()            # starts the chunked prefill job
    assert engine._prefill_job is not None
    assert engine.cancel(r_long)
    assert engine._prefill_job is None
    r_short = engine.submit(short, 5)
    engine.drain([r_short])
    np.testing.assert_array_equal(
        np.asarray(r_short.tokens), _expected(params, cfg, short, 5))
    assert engine.stats()["pool_pages_used"] == 0


def test_cancel_foreign_request_returns_false():
    """A Request this engine never saw must not be reported as cancelled."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(6)
    a = _engine(cfg, params)
    b = _engine(cfg, params)
    prompt = rng.integers(3, cfg.vocab_size, 6).tolist()
    req = a.submit(prompt, 4)
    a.step()
    assert b.cancel(req) is False      # not b's request
    a.drain([req])
    np.testing.assert_array_equal(
        np.asarray(req.tokens), _expected(params, cfg, prompt, 4))
