"""Speculative decoding (prompt-lookup drafts + chunked verify).

Exactness is the whole contract: greedy verification accepts a draft token
only when it equals the model's own argmax, so speculative output must be
TOKEN-IDENTICAL to plain greedy decode — these tests enforce that, plus the
chunk-verify forward primitive underneath."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8], ids=["f32", "int8"])
def test_chunk_decode_matches_sequential_steps(cache_dtype):
    """One chunk_decode forward over C tokens == C single-token decode
    forwards: same logits at every position, same cache contents after —
    with PER-ROW offsets (rows at different sequence positions)."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    B, S, C, Smax = 2, 12, 3, 64
    ids = rng.integers(3, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    ids[0, :4] = 0
    mask[0, :4] = 0  # row 0 left-padded: offsets diverge per row below

    fwd = lambda *a, **kw: llama.forward(params, cfg, *a, compute_dtype=jnp.float32, **kw)

    # prefill both caches identically
    def prefill():
        cache = llama.init_kv_cache(cfg, B, Smax, dtype=cache_dtype)
        kv_valid = jnp.zeros((B, Smax), jnp.int32).at[:, :S].set(jnp.asarray(mask))
        out = fwd(jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                  kv_cache=cache, cache_offset=0, kv_valid_mask=kv_valid)
        return out["kv_cache"], kv_valid

    prompt_len = jnp.asarray(mask.sum(-1), jnp.int32)
    chunk = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, C)), jnp.int32)
    # row 1 pretends to sit one column further (as after uneven acceptance)
    offsets = jnp.asarray([S, S], jnp.int32)

    # --- sequential single-token decodes -------------------------------
    cache_a, kv_valid_a = prefill()
    seq_logits = []
    for i in range(C):
        kv_valid_a = kv_valid_a.at[jnp.arange(B), offsets + i].set(1)
        out = fwd(chunk[:, i:i + 1],
                  attention_mask=jnp.ones((B, 1), jnp.int32),
                  positions=(prompt_len + i)[:, None],
                  kv_cache=cache_a, cache_offset=int(offsets[0]) + i,
                  kv_valid_mask=kv_valid_a)
        cache_a = out["kv_cache"]
        seq_logits.append(out["logits"][:, 0])

    # --- one chunked verify forward -------------------------------------
    cache_b, kv_valid_b = prefill()
    out = fwd(chunk,
              attention_mask=jnp.ones((B, C), jnp.int32),
              positions=prompt_len[:, None] + jnp.arange(C)[None, :],
              kv_cache=cache_b, cache_offset=offsets,
              kv_valid_mask=kv_valid_b, chunk_decode=True)
    chunk_logits = out["logits"]

    for i in range(C):
        np.testing.assert_allclose(
            np.asarray(chunk_logits[:, i]), np.asarray(seq_logits[i]),
            atol=5e-5 if cache_dtype == jnp.float32 else 5e-3,
            rtol=1e-4 if cache_dtype == jnp.float32 else 5e-3,
            err_msg=f"position {i}")
    # cache contents agree where written
    for key in ("k", "v"):
        a = np.asarray(cache_a[key][:, :, :, : S + C])
        b = np.asarray(out["kv_cache"][key][:, :, :, : S + C])
        np.testing.assert_allclose(a, b, atol=1e-5 if cache_dtype == jnp.float32 else 1)


from multimodal_unlearning_tpu.evaluation.generate import greedy_generate


def _gen(params, cfg, ids, mask, k=0, eos=None, cache_dtype=jnp.float32, **kw):
    return np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=12, pad_token_id=0, eos_token_id=eos,
        cache_dtype=cache_dtype, compute_dtype=jnp.float32,
        speculate_k=k, **kw,
    ))


def _prompts(cfg, rng, B=3, S=24, repetitive=True):
    """Left-padded batch; some rows get REPETITIVE prompts so the 2-gram
    lookup actually fires (random-token prompts rarely match)."""
    ids = rng.integers(3, cfg.vocab_size, (B, S))
    if repetitive:
        period = rng.integers(2, 5)
        ids[0] = np.tile(ids[0, :period], -(-S // period))[:S]
        ids[2, S // 2:] = ids[2, : S - S // 2]  # second half repeats the first
    mask = np.ones((B, S), np.int64)
    ids[1, :7] = 0
    mask[1, :7] = 0
    return ids, mask


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8], ids=["f32", "int8"])
def test_speculative_matches_plain_greedy(cache_dtype):
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    ids, mask = _prompts(cfg, rng)
    plain = _gen(params, cfg, ids, mask, k=0, cache_dtype=cache_dtype)
    for k in (2, 4, 7):
        spec = _gen(params, cfg, ids, mask, k=k, cache_dtype=cache_dtype)
        np.testing.assert_array_equal(spec, plain, err_msg=f"k={k}")


@pytest.mark.parametrize("family", ["neox", "phi", "stablelm"])
def test_speculative_gpt_family_matches_plain(family):
    """chunk_decode is family-agnostic: the gpt decoders (parallel residual,
    partial rotary, LayerNorm) run the same per-row verify-chunk attention,
    so speculative output must equal plain greedy for every family."""
    from multimodal_unlearning_tpu.models import gpt_decoder

    cfg = gpt_decoder.GptConfig.from_registry(dict(
        decoder=family, vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4,
    ))
    params = gpt_decoder.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids, mask = _prompts(cfg, rng)
    plain = _gen(params, cfg, ids, mask, k=0)
    for k in (3, 6):
        spec = _gen(params, cfg, ids, mask, k=k)
        np.testing.assert_array_equal(spec, plain, err_msg=f"{family} k={k}")


def test_speculative_matches_plain_greedy_with_eos():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    ids, mask = _prompts(cfg, rng)
    free = _gen(params, cfg, ids, mask, k=0)
    # eos = a token that actually occurs mid-stream in some row
    vals, counts = np.unique(free[:, 2:8], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    plain = _gen(params, cfg, ids, mask, k=0, eos=eos)
    spec = _gen(params, cfg, ids, mask, k=4, eos=eos)
    np.testing.assert_array_equal(spec, plain)


def test_speculative_vlm_matches_plain():
    from multimodal_unlearning_tpu.models import llava

    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    params = llava.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    n_img = cfg.num_image_tokens
    B = 2
    q = rng.integers(3, cfg.decoder.vocab_size, (B, 8))
    ids = np.concatenate(
        [np.full((B, n_img), cfg.image_token_id), q], axis=1)
    mask = np.ones_like(ids)
    pix = jnp.asarray(
        rng.normal(size=(B, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32)
    kw = dict(is_vlm=True, pixel_values=pix)
    plain = _gen(params, cfg, ids, mask, k=0, **kw)
    spec = _gen(params, cfg, ids, mask, k=4, **kw)
    np.testing.assert_array_equal(spec, plain)


def test_speculative_actually_accepts_drafts():
    """Non-vacuous: when the greedy stream loops (this seeded model falls
    into a 2-cycle — real greedy decodes loop the same way), the proposer
    must accept drafts and finish in substantially fewer verify rounds than
    tokens emitted; otherwise speculation is a correct but pointless
    1-token-per-forward loop.  And the output still matches plain greedy."""
    from multimodal_unlearning_tpu.evaluation.generate import _spec_generate
    from multimodal_unlearning_tpu.models.llama import INT8_COMPUTE

    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))  # looping seed
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (1, 16))
    mask = np.ones((1, 16), np.int64)
    max_new = 64
    tokens, rounds, n_out = _spec_generate(
        params, jnp.asarray(ids), jnp.asarray(mask), None,
        jnp.zeros((1, 0), jnp.int32),
        model_cfg=cfg, is_vlm=False, attn_impl="xla",
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        smax=256, max_new_tokens=max_new, pad_token_id=0, eos=-1,
        int8_compute=INT8_COMPUTE, k_spec=4, return_stats=True)
    assert int(np.asarray(n_out).sum()) == max_new
    # measured 39 rounds for 64 tokens (1.64 tok/forward); generous margin
    assert int(rounds) <= 52, f"rounds={int(rounds)}"
    plain = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=max_new, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(tokens), plain)


def test_reference_seeded_drafts_accept_near_perfectly():
    """Reference-corpus drafting: seed the lookup with the model's own plain
    greedy output — every draft then equals the model's argmax, so the
    verify loop must collapse to ~max_new/(K+1) rounds, and the output stays
    token-identical.  (In the eval engine the corpus is the ground-truth
    answer: acceptance is high exactly when the model tracks it.)"""
    from multimodal_unlearning_tpu.evaluation.generate import _spec_generate
    from multimodal_unlearning_tpu.models.llama import INT8_COMPUTE

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(5)
    ids = rng.integers(3, cfg.vocab_size, (2, 16))
    mask = np.ones((2, 16), np.int64)
    max_new, k = 32, 4
    plain = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=max_new, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32))
    tokens, rounds, n_out = _spec_generate(
        params, jnp.asarray(ids), jnp.asarray(mask), None,
        jnp.asarray(plain, jnp.int32),  # the corpus IS the greedy stream
        model_cfg=cfg, is_vlm=False, attn_impl="xla",
        compute_dtype=jnp.float32, cache_dtype=jnp.float32,
        smax=128, max_new_tokens=max_new, pad_token_id=0, eos=-1,
        int8_compute=INT8_COMPUTE, k_spec=k, return_stats=True)
    np.testing.assert_array_equal(np.asarray(tokens), plain)
    # perfect acceptance would need ceil((max_new-1)/(k+1)) = 7 rounds;
    # re-anchoring after duplicate 2-grams costs a few partial rounds —
    # observed 13 (2.4x fewer forwards than the 31 plain steps)
    assert int(rounds) <= 16, f"rounds={int(rounds)} (plain would be {max_new - 1})"


def test_greedy_generate_draft_ref_plumbs_and_stays_exact():
    """greedy_generate(draft_ref=...) with an arbitrary (even misleading)
    reference must still emit exactly the plain greedy stream."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(6)
    ids, mask = _prompts(cfg, rng)
    plain = _gen(params, cfg, ids, mask, k=0)
    bogus = rng.integers(3, cfg.vocab_size, (3, 20))
    spec = _gen(params, cfg, ids, mask, k=4, draft_ref=jnp.asarray(bogus, jnp.int32))
    np.testing.assert_array_equal(spec, plain)


def test_spec_engine_through_pallas_chunk_kernel(monkeypatch):
    """The serving engine's speculative verify rounds stream identical
    tokens through the flash verify-chunk kernel (interpret mode)."""
    from functools import partial

    import multimodal_unlearning_tpu.ops.decode_attention as da
    from multimodal_unlearning_tpu.serve import ServingEngine
    from tests.test_serve import _expected, tiny_decoder

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(42)
    motif = rng.integers(3, cfg.vocab_size, 5).tolist()
    prompts = [(motif * 6)[:27], rng.integers(3, cfg.vocab_size, 11).tolist()]

    def run():
        e = ServingEngine(
            params, cfg, "llama", num_slots=2, max_len=256, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            speculate_k=3, spec_ref_len=16)
        rs = [e.submit(p, 8, draft_ref=p[:10]) for p in prompts]
        e.drain(rs)
        return [list(r.tokens) for r in rs]

    base = run()
    orig = da.chunk_decode_attention
    monkeypatch.setattr(
        da, "chunk_decode_attention",
        partial(orig, impl="pallas", interpret=True))
    kernel_out = run()
    assert kernel_out == base
    for toks, p in zip(base, prompts):
        np.testing.assert_array_equal(
            np.asarray(toks), _expected(params, cfg, p, 8))
