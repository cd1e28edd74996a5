"""Chunked prefill (serve/engine.py ``prefill_chunk``): long prompts prefill
one bounded chunk per engine step — first chunk via the standalone fill
program, middle chunks as chunk_decode slab extensions, the final
right-padded chunk through the suffix-insert program — so in-flight slots
keep decoding between chunks.  Output must be TOKEN-IDENTICAL to monolithic
prefill (and hence to solo greedy_generate).

Beyond-reference: the reference's serving surface is HF batch ``generate``
(mm/eval.py:126-133) with no admission control at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama
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


@pytest.mark.parametrize("plen", [33, 48, 97])
def test_chunked_prefill_token_identical(plen):
    """Prompt lengths hitting every split shape: C<len<2C with ragged tail,
    exactly 3 full chunks (final chunk full-width), and >2C ragged."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(plen)
    prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
    engine = _engine(cfg, params, prefill_chunk=16)
    req = engine.submit(prompt, 8)
    engine.drain([req])
    want = _expected(params, cfg, prompt, 8)
    np.testing.assert_array_equal(np.asarray(req.tokens), want)
    # the prefill really was chunked: ceil splits with a <=C final chunk
    n_chunks = (plen - 1) // 16 + 1
    assert engine.stats()["prefill_chunks"] == n_chunks


def test_short_prompts_skip_chunking():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, cfg.vocab_size, 9).tolist()
    engine = _engine(cfg, params, prefill_chunk=16)
    req = engine.submit(prompt, 6)
    engine.drain([req])
    np.testing.assert_array_equal(
        np.asarray(req.tokens), _expected(params, cfg, prompt, 6))
    assert engine.stats()["prefill_chunks"] == 0


def test_decode_interleaves_between_prefill_chunks():
    """A short request admitted first keeps emitting while a long prompt's
    prefill is chunked across steps — the head-of-line-latency win."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    short = rng.integers(3, cfg.vocab_size, 5).tolist()
    long = rng.integers(3, cfg.vocab_size, 90).tolist()

    engine = _engine(cfg, params, prefill_chunk=16, pipeline=False)
    r_short = engine.submit(short, 30)
    engine.step()  # admits + starts decoding the short request
    r_long = engine.submit(long, 8)
    decode_dispatches_during_prefill = 0
    while engine._prefill_job is not None or engine._queue:
        before = engine.stats()["dispatches"]
        engine.step()
        if engine._prefill_job is not None:
            decode_dispatches_during_prefill += engine.stats()["dispatches"] - before
    engine.drain([r_short, r_long])
    # both streams still exactly greedy
    np.testing.assert_array_equal(
        np.asarray(r_short.tokens), _expected(params, cfg, short, 30))
    np.testing.assert_array_equal(
        np.asarray(r_long.tokens), _expected(params, cfg, long, 8))
    # and decode chunks actually fired while the long prefill was in flight
    assert decode_dispatches_during_prefill >= 2


def test_chunked_prefill_with_eos_and_slot_reuse():
    """Chunked prefill composes with eos retirement + slot refill."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(4)
    long_a = rng.integers(3, cfg.vocab_size, 40).tolist()
    free = _expected(params, cfg, long_a, 8)
    eos = int(free[2])
    engine = _engine(cfg, params, prefill_chunk=16, num_slots=1, eos_token_id=eos)
    reqs = [engine.submit(long_a, 8),
            engine.submit(rng.integers(3, cfg.vocab_size, 37).tolist(), 5)]
    engine.drain(reqs)

    def until_eos(stream):  # engine streams stop BEFORE eos, unpadded
        stream = list(int(t) for t in stream)
        return stream[: stream.index(eos)] if eos in stream else stream

    np.testing.assert_array_equal(np.asarray(reqs[0].tokens), until_eos(free))
    np.testing.assert_array_equal(
        np.asarray(reqs[1].tokens),
        until_eos(_expected(params, cfg, reqs[1].prompt_ids, 5)))


def test_chunked_prefill_speculative():
    """Spec mode: the final suffix-insert seeds ids_buf with the FULL prompt
    history (all chunks), so prompt-lookup drafting sees every 2-gram."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(5)
    # a repetitive prompt so speculation actually accepts
    motif = rng.integers(3, cfg.vocab_size, 6).tolist()
    prompt = (motif * 8)[:45]
    plain = _engine(cfg, params, prefill_chunk=16)
    spec = _engine(cfg, params, prefill_chunk=16, speculate_k=3, spec_ref_len=16)
    r0 = plain.submit(prompt, 10)
    plain.drain([r0])
    r1 = spec.submit(prompt, 10, draft_ref=prompt[:16])
    spec.drain([r1])
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r0.tokens))
    assert spec.stats()["prefill_chunks"] >= 3


def test_chunked_prefill_llava():
    """LLaVA: pixels ride the first chunk (image features splice there);
    image tokens past the boundary force a correct monolithic fallback."""
    from multimodal_unlearning_tpu.models import llava as llava_mod

    arch = get_model_identifiers("tiny-llava-test").arch
    mcfg = llava_mod.LlavaConfig.from_registry(arch)
    params = llava_mod.init_params(mcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    n_img = mcfg.num_image_tokens
    img = rng.normal(
        size=(mcfg.vision.image_size, mcfg.vision.image_size, 3)).astype(np.float32)
    text = lambda n: rng.integers(3, mcfg.decoder.vocab_size, n).tolist()

    def engine(**kw):
        return ServingEngine(
            params, mcfg, "llava", num_slots=1, max_len=256, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32, **kw)

    # image span inside the first chunk, long text tail -> chunked
    C = -(-(n_img + 4) // 16) * 16
    prompt = [mcfg.image_token_id] * n_img + text(C + 30 - n_img)
    mono, chunked = engine(), engine(prefill_chunk=C)
    r0 = mono.submit(prompt, 6, pixel_values=img)
    mono.drain([r0])
    r1 = chunked.submit(prompt, 6, pixel_values=img)
    chunked.drain([r1])
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r0.tokens))
    assert chunked.stats()["prefill_chunks"] >= 2

    # image tokens BEYOND the first chunk -> monolithic fallback, same tokens
    prompt2 = text(C + 4) + [mcfg.image_token_id] * n_img + text(8)
    mono2, fb = engine(), engine(prefill_chunk=C)
    r2 = mono2.submit(prompt2, 6, pixel_values=img)
    mono2.drain([r2])
    r3 = fb.submit(prompt2, 6, pixel_values=img)
    fb.drain([r3])
    np.testing.assert_array_equal(np.asarray(r3.tokens), np.asarray(r2.tokens))
    assert fb.stats()["prefill_chunks"] == 0


def test_chunked_prefill_qwen2vl_mrope():
    """Qwen2-VL: the first chunk's M-RoPE rope delta rides the job; text
    chunks continue decode-style offsets (models/qwen2_vl.py:forward)."""
    from multimodal_unlearning_tpu.models import qwen2_vl

    arch = get_model_identifiers("tiny-qwen2vl-test").arch
    qcfg = qwen2_vl.QwenVLConfig.from_registry(arch)
    qparams = qwen2_vl.init_params(qcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    grid = qcfg.default_grid
    ms = qcfg.vision.spatial_merge_size
    n_img = grid[0] * (grid[1] // ms) * (grid[2] // ms)
    pix = rng.normal(
        size=(grid[0] * grid[1] * grid[2], qcfg.vision.patch_dim)).astype(np.float32)
    C = -(-(n_img + 4) // 16) * 16
    prompt = [qcfg.image_token_id] * n_img + rng.integers(
        3, qcfg.decoder.vocab_size, C + 25 - n_img).tolist()

    def run(chunked):
        e = ServingEngine(
            qparams, qcfg, "qwen2_vl", num_slots=1, max_len=256, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            prefill_chunk=C if chunked else 0)
        out = e.drain([e.submit(prompt, 6, pixel_values=pix)])
        if chunked:
            assert e.stats()["prefill_chunks"] >= 2
        return out

    assert run(True) == run(False)
