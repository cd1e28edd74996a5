"""Serving-engine prefix caching (serve/engine.py:register_prefix).

A registered prefix is prefilled once into a KV slab; requests submitted
with ``prefix=<id>`` prefill only their suffix (one chunk_decode pass
against the copied slab).  The contract is pure recompute-saving: streams
must equal the no-prefix engine's (and hence solo greedy_generate) for the
concatenated prompt, across decoder families, sampling, and speculation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama, llava
from multimodal_unlearning_tpu.serve import ServingEngine


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engine(params, cfg, kind="llama", **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("max_len", 128)
    kw.setdefault("chunk", 3)
    return ServingEngine(
        params, cfg, kind, bucket_multiple=16, pad_token_id=0,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, **kw)


def test_prefix_streams_equal_full_prompt_streams():
    """System-prompt sharing: N requests = shared prefix + own suffixes.
    Prefix-cached streams must equal full-prompt no-prefix streams."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    system = rng.integers(3, cfg.vocab_size, 19).tolist()
    suffixes = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (4, 9, 13, 2)]
    budgets = [7, 5, 8, 6]

    eng = _engine(params, cfg)
    want = eng.drain([eng.submit(system + s, m) for s, m in zip(suffixes, budgets)])

    eng2 = _engine(params, cfg)
    pid = eng2.register_prefix(system)
    got = eng2.drain([eng2.submit(s, m, prefix=pid)
                      for s, m in zip(suffixes, budgets)])
    assert got == want


def test_prefix_with_eos_and_slot_churn():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    system = rng.integers(3, cfg.vocab_size, 10).tolist()
    suffixes = [rng.integers(3, cfg.vocab_size, int(rng.integers(2, 14))).tolist()
                for _ in range(9)]

    def run(use_prefix, eos):
        eng = _engine(params, cfg, num_slots=2, eos_token_id=eos)
        pid = eng.register_prefix(system) if use_prefix else None
        reqs = [eng.submit(s if use_prefix else system + s, 6, prefix=pid)
                for s in suffixes]
        return eng.drain(reqs)

    free = run(False, None)
    eos = int(np.bincount(np.concatenate(
        [np.asarray(t) for t in free if t])).argmax())
    assert run(True, eos) == run(False, eos)


def test_prefix_mixed_with_plain_requests_and_sampling():
    """Prefix and no-prefix requests interleave in the same engine; sampled
    streams keep the (seed, index) determinism contract."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    system = rng.integers(3, cfg.vocab_size, 8).tolist()
    sfx = rng.integers(3, cfg.vocab_size, 5).tolist()
    other = rng.integers(3, cfg.vocab_size, 11).tolist()

    def run(use_prefix):
        eng = _engine(params, cfg, temperature=0.8, top_k=30)
        pid = eng.register_prefix(system) if use_prefix else None
        r1 = eng.submit(sfx if use_prefix else system + sfx, 6,
                        sample_seed=5, prefix=pid)
        r2 = eng.submit(other, 6, sample_seed=6)
        return eng.drain([r1, r2])

    assert run(True) == run(False)


def test_prefix_with_speculation():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    system = rng.integers(3, cfg.vocab_size, 9).tolist()
    sfx = (rng.integers(3, cfg.vocab_size, 3).tolist() * 4)[:10]  # repetitive

    def run(k, use_prefix):
        eng = _engine(params, cfg, speculate_k=k, spec_ref_len=16 if k else 0)
        pid = eng.register_prefix(system) if use_prefix else None
        req = eng.submit(sfx if use_prefix else system + sfx, 9, prefix=pid)
        return eng.drain([req])

    want = run(0, False)
    assert run(4, True) == want and run(0, True) == want


def test_prefix_vlm_image_preamble():
    """LLaVA: the image + preamble is the prefix (prefilled once with
    pixel_values); per-question suffixes are text-only."""
    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    params = llava.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    n_img = cfg.num_image_tokens
    img = rng.normal(size=(cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    preamble = [cfg.image_token_id] * n_img + rng.integers(
        3, cfg.decoder.vocab_size, 4).tolist()
    questions = [rng.integers(3, cfg.decoder.vocab_size, n).tolist() for n in (5, 8)]

    eng = _engine(params, cfg, kind="llava", max_len=192)
    want = eng.drain([eng.submit(preamble + q, 5, pixel_values=img)
                      for q in questions])

    eng2 = _engine(params, cfg, kind="llava", max_len=192)
    pid = eng2.register_prefix(preamble, pixel_values=img)
    got = eng2.drain([eng2.submit(q, 5, prefix=pid) for q in questions])
    assert got == want


def test_prefix_gpt_family():
    from multimodal_unlearning_tpu.models import gpt_decoder

    cfg = gpt_decoder.GptConfig.from_registry(dict(
        decoder="stablelm", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=4,
    ))
    params = gpt_decoder.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    system = rng.integers(3, cfg.vocab_size, 12).tolist()
    sfx = rng.integers(3, cfg.vocab_size, 6).tolist()

    eng = _engine(params, cfg, kind="stablelm")
    want = eng.drain([eng.submit(system + sfx, 6)])
    eng2 = _engine(params, cfg, kind="stablelm")
    pid = eng2.register_prefix(system)
    assert eng2.drain([eng2.submit(sfx, 6, prefix=pid)]) == want


def test_prefix_rejections():
    cfg, params = tiny_decoder()
    eng = _engine(params, cfg)
    pid = eng.register_prefix([5, 6, 7])
    with pytest.raises(ValueError):
        eng.submit([], 4, prefix=pid)


@pytest.mark.parametrize(
    "family", ["tiny-qwen2vl-test", "tiny-qwen25vl-test"], ids=["qwen2vl", "qwen25vl"]
)
def test_prefix_qwen2vl_mrope(family):
    """Qwen2-VL / Qwen2.5-VL prefix: the image+preamble slab carries its
    M-RoPE rope delta; text suffixes continue decode-style.  Streams ==
    full-prompt (2.5: through the windowed RMS/SwiGLU tower)."""
    arch = get_model_identifiers(family).arch
    from multimodal_unlearning_tpu.models import qwen2_vl

    qcfg = qwen2_vl.QwenVLConfig.from_registry(arch)
    qparams = qwen2_vl.init_params(qcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    grid = qcfg.default_grid
    ms = qcfg.vision.spatial_merge_size
    n_img = grid[0] * (grid[1] // ms) * (grid[2] // ms)
    pix = rng.normal(
        size=(grid[0] * grid[1] * grid[2], qcfg.vision.patch_dim)).astype(np.float32)
    preamble = [qcfg.image_token_id] * n_img + rng.integers(
        3, qcfg.decoder.vocab_size, 4).tolist()
    questions = [rng.integers(3, qcfg.decoder.vocab_size, n).tolist() for n in (5, 9)]

    def run(use_prefix):
        e = _engine(qparams, qcfg, kind="qwen2_vl", max_len=192)
        if use_prefix:
            pid = e.register_prefix(preamble, pixel_values=pix)
            reqs = [e.submit(q, 5, prefix=pid) for q in questions]
        else:
            reqs = [e.submit(preamble + q, 5, pixel_values=pix) for q in questions]
        return e.drain(reqs)

    assert run(True) == run(False)
