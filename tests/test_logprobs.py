"""Per-token logprobs from the serving engine (``logprobs=True``): each
emitted token carries its raw ``log_softmax`` value, aligned with
``Request.tokens``, across plain greedy, speculative verify rounds,
sampling, prefix caching, and paged caches.

Ground truth: a teacher-forced forward over [prompt | generated] — the
logprob of generated token i is log_softmax(logits at the position
PRECEDING it)[token i].

Beyond-reference serving-API parity (OpenAI completions ``logprobs``);
the reference's eval loop never exposes per-token scores
(mm/eval.py:126-133).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.serve import ServingEngine

from tests.test_serve import _expected, tiny_decoder


def _engine(cfg, params, **kw):
    base = dict(
        num_slots=2, max_len=256, chunk=4, bucket_multiple=16,
        pad_token_id=0, eos_token_id=None, logprobs=True,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    base.update(kw)
    return ServingEngine(params, cfg, "llama", **base)


def _teacher_forced_lps(params, cfg, prompt, gen):
    """log_softmax at the positions that predicted each generated token."""
    seq = np.asarray(list(prompt) + list(gen), np.int32)[None]
    out = llama.forward(
        params, cfg, jnp.asarray(seq),
        attention_mask=jnp.ones_like(jnp.asarray(seq)),
        compute_dtype=jnp.float32)
    lps = jax.nn.log_softmax(out["logits"][0].astype(jnp.float32), axis=-1)
    P = len(prompt)
    return np.asarray([
        float(lps[P - 1 + i, t]) for i, t in enumerate(gen)])


def test_greedy_logprobs_match_teacher_forced():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    specs = [(5, 6), (11, 4), (19, 7)]
    engine = _engine(cfg, params)
    reqs = []
    for plen, max_new in specs:
        prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
        reqs.append((engine.submit(prompt, max_new), prompt))
    engine.drain([r for r, _ in reqs])
    for req, prompt in reqs:
        assert len(req.logprobs) == len(req.tokens)
        want = _teacher_forced_lps(params, cfg, prompt, req.tokens)
        np.testing.assert_allclose(np.asarray(req.logprobs), want,
                                   rtol=2e-5, atol=2e-5)


def test_speculative_logprobs_match_plain():
    """Verify-round logprobs come from the chunked forward — they must
    equal the plain engine's per-step values (same model positions)."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    prompt = (motif * 6)[:26]
    plain = _engine(cfg, params)
    spec = _engine(cfg, params, speculate_k=3, spec_ref_len=16)
    r0 = plain.submit(prompt, 9)
    plain.drain([r0])
    r1 = spec.submit(prompt, 9, draft_ref=prompt[:12])
    spec.drain([r1])
    assert r1.tokens == r0.tokens
    np.testing.assert_allclose(
        np.asarray(r1.logprobs), np.asarray(r0.logprobs), rtol=2e-5, atol=2e-5)


def test_sampled_logprobs_are_raw_model_scores():
    """Sampling picks the token; the logprob reported is the RAW model
    log_softmax at that token (not temperature-rescaled)."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, cfg.vocab_size, 8).tolist()
    engine = _engine(cfg, params, temperature=0.9, top_k=10)
    req = engine.submit(prompt, 6, sample_seed=7)
    engine.drain([req])
    assert len(req.logprobs) == len(req.tokens)
    want = _teacher_forced_lps(params, cfg, prompt, req.tokens)
    np.testing.assert_allclose(np.asarray(req.logprobs), want,
                               rtol=2e-5, atol=2e-5)


def test_logprobs_with_prefix_and_paged():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    sys_prompt = rng.integers(3, cfg.vocab_size, 18).tolist()
    suffix = rng.integers(3, cfg.vocab_size, 7).tolist()
    engine = _engine(cfg, params, page_size=16)
    pid = engine.register_prefix(sys_prompt)
    req = engine.submit(suffix, 6, prefix=pid)
    engine.drain([req])
    # ground truth: solo run on the CONCATENATED prompt
    want_tokens = _expected(params, cfg, sys_prompt + suffix, 6, bucket=32)
    np.testing.assert_array_equal(np.asarray(req.tokens), want_tokens)
    want = _teacher_forced_lps(params, cfg, sys_prompt + suffix, req.tokens)
    np.testing.assert_allclose(np.asarray(req.logprobs), want,
                               rtol=2e-5, atol=2e-5)


def test_eos_stops_logprob_stream_aligned():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, cfg.vocab_size, 9).tolist()
    free = _expected(params, cfg, prompt, 8)
    eos = int(free[3])
    engine = _engine(cfg, params, eos_token_id=eos)
    req = engine.submit(prompt, 8)
    engine.drain([req])
    assert len(req.logprobs) == len(req.tokens) == 3
