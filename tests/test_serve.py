"""Continuous-batching serving engine (serve/engine.py).

The engine must be a pure re-batching of greedy decoding: every request's
token stream equals what evaluation/generate.py:greedy_generate produces
for that prompt alone, regardless of which slot it lands in, what else is
in flight, or when it was admitted."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
from multimodal_unlearning_tpu.models import llama, llava
from multimodal_unlearning_tpu.serve import ServingEngine


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _expected(params, cfg, prompt, max_new, bucket=16, eos=None, **kw):
    """greedy_generate on the single left-padded prompt, engine-bucketed."""
    sp = -(-len(prompt) // bucket) * bucket
    ids = np.zeros((1, sp), np.int32)
    mask = np.zeros((1, sp), np.int32)
    ids[0, sp - len(prompt):] = prompt
    mask[0, sp - len(prompt):] = 1
    row = greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=max_new, pad_token_id=0, eos_token_id=eos,
        cache_dtype=kw.pop("cache_dtype", jnp.float32),
        compute_dtype=jnp.float32, **kw,
    )
    return np.asarray(row)[0]


import pytest


@pytest.mark.parametrize("pipeline", [True, False], ids=["pipelined", "sync"])
def test_engine_matches_greedy_generate_mixed_lengths(pipeline):
    """5 requests, 2 slots, different prompt lengths and budgets: every
    request's stream must equal its solo greedy_generate run (slot reuse,
    mixed per-slot progress, bucketed prefill) — in both the pipelined
    (chunk k+1 dispatched before chunk k is read) and sync modes."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    engine = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=4,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, pipeline=pipeline,
    )
    specs = [(5, 6), (11, 3), (3, 9), (14, 5), (8, 7)]  # (prompt_len, max_new)
    reqs = []
    for plen, max_new in specs:
        prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
        reqs.append((engine.submit(prompt, max_new), prompt, max_new))
    engine.drain([r for r, _, _ in reqs])
    for req, prompt, max_new in reqs:
        want = _expected(params, cfg, prompt, max_new)
        got = np.asarray(req.tokens)
        assert req.done
        np.testing.assert_array_equal(got, want, err_msg=f"prompt_len={len(prompt)}")


def test_engine_eos_early_stop_frees_slot():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, cfg.vocab_size, 7).tolist()
    free_run = _expected(params, cfg, prompt, 8)
    eos = int(free_run[3])  # force a stop after 3 emitted tokens

    engine = ServingEngine(
        params, cfg, "llama", num_slots=1, max_len=128, chunk=4,
        bucket_multiple=16, pad_token_id=0, eos_token_id=eos,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    r1 = engine.submit(prompt, 8)
    prompt2 = rng.integers(3, cfg.vocab_size, 4).tolist()
    r2 = engine.submit(prompt2, 3)  # queued behind the single slot
    engine.run()
    assert r1.done and r1.tokens == free_run[:3].tolist()
    want2_free = _expected(params, cfg, prompt2, 3)  # unconstrained stream
    stop = np.argwhere(want2_free == eos)
    n2 = int(stop[0][0]) if len(stop) else 3
    assert r2.done and r2.tokens == want2_free[:n2].tolist()


def test_engine_int8_cache_matches_greedy_int8():
    """Per-row scatter KV write (int8 quantize-at-write) must reproduce the
    batched greedy int8-cache decode."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, cfg.vocab_size, 9).tolist()
    engine = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=4,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.int8, compute_dtype=jnp.float32,
    )
    req = engine.submit(prompt, 6)
    engine.drain([req])
    want = _expected(params, cfg, prompt, 6, cache_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(req.tokens), want)


def test_engine_soak_many_requests_with_eos_churn():
    """40 requests through 4 slots with tiny budgets and an eos that fires
    often: maximal slot churn (admissions mid-flight, retirements mid-chunk,
    pipelined consumption one chunk behind).  Every stream must equal its
    solo greedy free-run truncated at the first eos."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(6)
    # pick a *frequent* token as eos: the argmax over a random prompt's
    # free-run — random-init models repeat themselves, so this fires a lot
    probe = _expected(params, cfg, rng.integers(3, cfg.vocab_size, 6).tolist(), 8)
    eos = int(np.bincount(probe).argmax())

    engine = ServingEngine(
        params, cfg, "llama", num_slots=4, max_len=64, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=eos,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    cases = []
    for _ in range(40):
        plen = int(rng.integers(3, 30))
        budget = int(rng.integers(1, 7))
        prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
        cases.append((engine.submit(prompt, budget), prompt, budget))
    engine.drain([r for r, _, _ in cases])
    for req, prompt, budget in cases:
        free = _expected(params, cfg, prompt, budget)  # no-eos stream
        stop = np.argwhere(free == eos)
        n = int(stop[0][0]) if len(stop) else budget
        assert req.tokens == free[:n].tolist(), (
            f"plen={len(prompt)} budget={budget} eos={eos}")


@pytest.mark.parametrize("pipeline", [True, False], ids=["pipelined", "sync"])
def test_engine_speculative_matches_plain_engine(pipeline):
    """speculate_k>0 must be a pure throughput change: every request's
    stream equals the plain engine's (and hence solo greedy_generate),
    across slot reuse and mixed per-slot acceptance progress."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(7)
    specs = [(5, 8), (11, 5), (3, 9), (14, 6), (8, 7)]
    prompts = [rng.integers(3, cfg.vocab_size, p).tolist() for p, _ in specs]
    # make row 0 repetitive so the lookup actually accepts drafts
    prompts[0] = (prompts[0] * 4)[:16]

    def run(k):
        eng = ServingEngine(
            params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            pipeline=pipeline, speculate_k=k, spec_ref_len=24 if k else 0,
        )
        reqs = [eng.submit(p, m) for p, (_, m) in zip(prompts, specs)]
        return eng.drain(reqs)

    assert run(4) == run(0)


def test_engine_speculative_eos_churn_soak():
    """Spec engine under heavy eos churn (frequent eos, tiny budgets, 4
    slots, 30 requests): device-decided retirement must replay exactly the
    plain engine's streams."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(8)
    probe = _expected(params, cfg, rng.integers(3, cfg.vocab_size, 6).tolist(), 8)
    eos = int(np.bincount(probe).argmax())
    cases = [(rng.integers(3, cfg.vocab_size, int(rng.integers(3, 30))).tolist(),
              int(rng.integers(1, 7))) for _ in range(30)]

    def run(k):
        eng = ServingEngine(
            params, cfg, "llama", num_slots=4, max_len=64, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=eos,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            speculate_k=k,
        )
        reqs = [eng.submit(p, m) for p, m in cases]
        return eng.drain(reqs)

    assert run(3) == run(0)


def test_engine_speculative_draft_ref_exact_and_accepts():
    """Per-request draft corpora: seeding each request with its own plain
    greedy stream keeps output identical AND must actually accept (the
    drained spec run finishes in fewer decode dispatches than plain)."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(9)
    prompts = [rng.integers(3, cfg.vocab_size, n).tolist() for n in (6, 12)]
    plain = [_expected(params, cfg, p, 24).tolist() for p in prompts]

    def run(k, refs):
        eng = ServingEngine(
            params, cfg, "llama", num_slots=2, max_len=128, chunk=2,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            speculate_k=k, spec_ref_len=24 if k else 0,
        )
        reqs = [eng.submit(p, 24, draft_ref=r) for p, r in zip(prompts, refs)]
        n_steps = 0
        while not all(r.done for r in reqs):
            eng.step()
            n_steps += 1
        return [r.tokens for r in reqs], n_steps

    toks_plain, steps_plain = run(0, [None, None])
    toks_spec, steps_spec = run(4, plain)
    assert toks_plain == plain and toks_spec == plain
    assert steps_spec < steps_plain, (steps_spec, steps_plain)
    # the stats counter agrees: reference-seeded drafts accept > 1 tok/round
    eng = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=2,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        speculate_k=4, spec_ref_len=24,
    )
    eng.drain([eng.submit(p, 24, draft_ref=r) for p, r in zip(prompts, plain)])
    assert eng.stats()["tokens_per_round"] > 1.5, eng.stats()
    # misleading corpus: still exact
    bogus = [rng.integers(3, cfg.vocab_size, 20).tolist() for _ in prompts]
    toks_bogus, _ = run(4, bogus)
    assert toks_bogus == plain


def test_engine_speculative_vlm_and_gpt():
    """Spec engine across model kinds: llava (VLM wrapper chunk_decode) and
    neox (gpt-family chunk_decode) both stream exactly greedy."""
    from multimodal_unlearning_tpu.models import gpt_decoder

    rng = np.random.default_rng(10)
    # --- gpt family ---
    gcfg = gpt_decoder.GptConfig.from_registry(dict(
        decoder="neox", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rotary_pct=0.25,
    ))
    gparams = gpt_decoder.init_params(gcfg, jax.random.PRNGKey(0))
    prompt = rng.integers(3, gcfg.vocab_size, 9).tolist()
    eng = ServingEngine(
        gparams, gcfg, "neox", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, speculate_k=3,
    )
    req = eng.submit(prompt, 7)
    eng.drain([req])
    np.testing.assert_array_equal(
        np.asarray(req.tokens), _expected(gparams, gcfg, prompt, 7))

    # --- llava ---
    arch = get_model_identifiers("tiny-llava-test").arch
    vcfg = llava.LlavaConfig.from_registry(arch)
    vparams = llava.init_params(vcfg, jax.random.PRNGKey(0))
    n_img = vcfg.num_image_tokens
    img = rng.normal(size=(vcfg.vision.image_size, vcfg.vision.image_size, 3)).astype(np.float32)
    vprompt = [vcfg.image_token_id] * n_img + rng.integers(
        3, vcfg.decoder.vocab_size, 6).tolist()
    eng = ServingEngine(
        vparams, vcfg, "llava", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, speculate_k=3,
    )
    req = eng.submit(vprompt, 5, pixel_values=img)
    eng.drain([req])
    want = _expected(vparams, vcfg, vprompt, 5, is_vlm=True,
                     pixel_values=jnp.asarray(img[None], jnp.float32))
    np.testing.assert_array_equal(np.asarray(req.tokens), want)


def test_engine_gpt_family_matches_greedy():
    """The other decoder family (neox: parallel residual, partial rotary)
    through the engine's shared per-row cache-write path."""
    from multimodal_unlearning_tpu.models import gpt_decoder

    arch = dict(
        decoder="neox", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        max_position_embeddings=256, layer_norm_eps=1e-5, rotary_pct=0.25,
    )
    cfg = gpt_decoder.GptConfig.from_registry(arch)
    params = gpt_decoder.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    engine = ServingEngine(
        params, cfg, "neox", num_slots=2, max_len=128, chunk=4,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    specs = [(6, 5), (12, 7), (4, 4)]
    reqs = [(engine.submit((p := rng.integers(3, cfg.vocab_size, n).tolist()), m), p, m)
            for n, m in specs]
    engine.drain([r for r, _, _ in reqs])
    for req, prompt, max_new in reqs:
        want = _expected(params, cfg, prompt, max_new)
        np.testing.assert_array_equal(np.asarray(req.tokens), want)


def test_engine_tensor_parallel_matches_unsharded():
    """Engine under a tensor=2 mesh (decoder weights Megatron-sharded,
    GSPMD collectives inside the prefill/decode programs) must stream the
    same tokens as the unsharded engine."""
    from multimodal_unlearning_tpu.cli.common import apply_tensor_parallel
    from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(4)
    specs = [(6, 5), (10, 4), (4, 6)]
    prompts = [rng.integers(3, cfg.vocab_size, p).tolist() for p, _ in specs]

    def run(mesh, p):
        eng = ServingEngine(
            p, cfg, "llama", num_slots=2, max_len=128, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh,
        )
        reqs = [eng.submit(pr, m) for pr, (_, m) in zip(prompts, specs)]
        return eng.drain(reqs)

    base = run(None, params)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, tensor=2))
    tp_params = apply_tensor_parallel(mesh, cfg, "llama", jax.tree.map(jnp.asarray, params))
    with mesh:
        tp = run(mesh, tp_params)
    assert tp == base


def test_serve_cli(tmp_path):
    """The serve CLI end-to-end: JSONL requests (text-only + image path)
    through the chat template into the engine, completions written out."""
    import json

    from PIL import Image

    from multimodal_unlearning_tpu.cli import serve
    from multimodal_unlearning_tpu.config import load_config
    from multimodal_unlearning_tpu.config.registry import config_dir

    img_path = tmp_path / "face.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 32, 3), np.uint8)
    ).save(img_path)
    reqs = tmp_path / "requests.jsonl"
    reqs.write_text(
        json.dumps({"question": "Who is shown?", "image": str(img_path)}) + "\n"
        + json.dumps({"question": "What color is the sky?", "max_new_tokens": 3}) + "\n"
    )

    cfg = load_config(config_dir() / "mm", "serve")
    for k, v in {
        "model_family": "tiny-llava-test", "model_path": None,
        "processor_path": None, "requests": str(reqs),
        "save_file": str(tmp_path / "out.jsonl"), "num_slots": 2,
        "max_length": 256, "chunk": 4, "dtype": "float32",
        "quantize_base": False,
    }.items():
        dict.__setitem__(cfg, k, v)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 5)

    rows = serve.run(cfg)
    assert len(rows) == 2
    assert rows[0]["tokens"] >= 1 and rows[1]["tokens"] >= 1
    written = [json.loads(l) for l in (tmp_path / "out.jsonl").read_text().splitlines()]
    assert [r["question"] for r in written] == ["Who is shown?", "What color is the sky?"]


def test_engine_vlm_request():
    """LLaVA request: image-conditioned prefill into a slot, decode parity
    with the solo greedy run."""
    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    params = llava.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)

    n_img = cfg.num_image_tokens
    img = rng.normal(size=(cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    prompt = [cfg.image_token_id] * n_img + rng.integers(
        3, cfg.decoder.vocab_size, 6).tolist()

    engine = ServingEngine(
        params, cfg, "llava", num_slots=2, max_len=128, chunk=4,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    req = engine.submit(prompt, 5, pixel_values=img)
    engine.drain([req])
    want = _expected(
        params, cfg, prompt, 5, is_vlm=True,
        pixel_values=jnp.asarray(img[None], jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(req.tokens), want)
