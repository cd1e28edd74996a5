"""Stochastic decoding (evaluation/sampling.py — beyond-reference).

Contracts: (1) the logits processor implements HF temperature/top-k/top-p
semantics on crafted distributions; (2) streams are a pure function of
(seed, output index) — reproducible, seed-sensitive, and IDENTICAL whether
a request runs solo through greedy_generate(do_sample=True) or through the
continuous-batching serving engine under slot churn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
from multimodal_unlearning_tpu.evaluation.sampling import process_logits
from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.serve import ServingEngine


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


# ---------------------------------------------------------------- processor
def test_top_k_restricts_support():
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    out = np.asarray(process_logits(logits, 1.0, top_k=2))
    assert np.isfinite(out[0, :2]).all() and np.isinf(out[0, 2:]).all()


def test_top_p_keeps_smallest_nucleus_incl_argmax():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.012]; top_p=0.8 keeps first two
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    out = np.asarray(process_logits(logits, 1.0, top_p=0.8))
    assert np.isfinite(out[0, :2]).all() and np.isinf(out[0, 2:]).all()
    # tiny top_p still keeps the argmax
    out = np.asarray(process_logits(logits, 1.0, top_p=1e-6))
    assert np.isfinite(out[0, 0]) and np.isinf(out[0, 1:]).all()


def test_temperature_scales():
    logits = jnp.asarray([[2.0, 1.0]])
    out = np.asarray(process_logits(logits, 0.5))
    np.testing.assert_allclose(out, [[4.0, 2.0]], rtol=1e-6)


# ---------------------------------------------------------------- generate
def _sample(params, cfg, ids, mask, seeds, **kw):
    return np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=10, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        do_sample=True, sample_seeds=seeds, **kw,
    ))


def test_sampling_reproducible_and_seed_sensitive():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (3, 12))
    mask = np.ones((3, 12), np.int64)
    a = _sample(params, cfg, ids, mask, [1, 2, 3], temperature=1.0)
    b = _sample(params, cfg, ids, mask, [1, 2, 3], temperature=1.0)
    np.testing.assert_array_equal(a, b)
    c = _sample(params, cfg, ids, mask, [4, 5, 6], temperature=1.0)
    assert (a != c).any()  # 30 tokens: astronomically unlikely to collide
    # same row + same seed is batch-placement independent
    solo = _sample(params, cfg, ids[1:2], mask[1:2], [2], temperature=1.0)
    np.testing.assert_array_equal(solo[0], a[1])


def test_top_k_1_equals_greedy():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    ids = rng.integers(3, cfg.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int64)
    greedy = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=10, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32))
    topk1 = _sample(params, cfg, ids, mask, [7, 8], temperature=1.0, top_k=1)
    np.testing.assert_array_equal(topk1, greedy)


def test_speculate_plus_sample_rejected():
    cfg, params = tiny_decoder()
    with pytest.raises(ValueError):
        greedy_generate(
            params, cfg, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
            max_new_tokens=4, pad_token_id=0, do_sample=True, speculate_k=4)


# ------------------------------------------------------------------ engine
def test_engine_sampled_streams_match_solo_generate():
    """The determinism contract end-to-end: requests with explicit seeds
    through a churning 2-slot engine sample exactly the tokens their solo
    greedy_generate(do_sample=True) run samples."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    specs = [(5, 7), (11, 4), (3, 8), (8, 6)]
    prompts = [rng.integers(3, cfg.vocab_size, p).tolist() for p, _ in specs]
    seeds = [101, 202, 303, 404]

    eng = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        temperature=0.9, top_k=40, top_p=0.95,
    )
    reqs = [eng.submit(p, m, sample_seed=s)
            for p, (_, m), s in zip(prompts, specs, seeds)]
    got = eng.drain(reqs)

    for toks, prompt, (_, max_new), seed in zip(got, prompts, specs, seeds):
        sp = -(-len(prompt) // 16) * 16
        ids = np.zeros((1, sp), np.int32)
        mask = np.zeros((1, sp), np.int32)
        ids[0, sp - len(prompt):] = prompt
        mask[0, sp - len(prompt):] = 1
        want = np.asarray(greedy_generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=max_new, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            do_sample=True, sample_seeds=[seed],
            temperature=0.9, top_k=40, top_p=0.95))[0]
        np.testing.assert_array_equal(np.asarray(toks), want, err_msg=f"seed={seed}")


def test_engine_sampling_plus_speculation_rejected():
    cfg, params = tiny_decoder()
    with pytest.raises(ValueError):
        ServingEngine(
            params, cfg, "llama", num_slots=1, max_len=64,
            temperature=1.0, speculate_k=4)
