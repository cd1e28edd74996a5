"""Multi-LoRA serving (models/lora.py:stack_adapters + per-row banks).

The unlearning sweep produces one LoRA adapter per (loss, config); serving
them for A/B comparison should not need one engine per checkpoint.  The
engine stacks the adapters into one bank and every slot decodes through
its own adapter in the same forward (models/llama.py:apply_lora_delta
gather).  Contracts: per-row bank application == the scalar single-adapter
path, and engine streams under mixed adapters == per-adapter engines."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama, llava, lora as lora_lib
from multimodal_unlearning_tpu.serve import ServingEngine


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _trained_adapter(params, r, key):
    """An adapter whose delta is nonzero (init_lora b=0 is a no-op)."""
    tree = lora_lib.init_model_lora(params, r, key)
    return jax.tree.map(
        lambda x: x if x.ndim < 2 else
        jax.random.normal(jax.random.fold_in(key, x.size), x.shape) * 0.05,
        tree)


def test_bank_matches_scalar_lora_logits():
    """Per-row bank forward == scalar-adapter forward, row by row."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (3, 10)), jnp.int32)
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(1))
    t2 = _trained_adapter(params, 4, jax.random.PRNGKey(2))
    s1, s2 = 2.0, 0.5

    zero = jax.tree.map(jnp.zeros_like, t1)
    bank = lora_lib.stack_adapters([zero, t1, t2], [0.0, s1, s2])
    out_bank = llama.forward(
        params, cfg, ids, lora=bank, lora_scale=1.0,
        lora_ids=jnp.asarray([1, 2, 0]), compute_dtype=jnp.float32)["logits"]

    for row, (tree, scale) in enumerate([(t1, s1), (t2, s2), (None, 0.0)]):
        want = llama.forward(
            params, cfg, ids[row: row + 1], lora=tree, lora_scale=scale,
            compute_dtype=jnp.float32)["logits"]
        np.testing.assert_allclose(
            np.asarray(out_bank[row: row + 1]), np.asarray(want),
            rtol=2e-5, atol=2e-5, err_msg=f"row {row}")


def test_engine_mixed_adapters_match_per_adapter_engines():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(3))
    t2 = _trained_adapter(params, 4, jax.random.PRNGKey(4))
    adapters = {"npo": (t1, 2.0), "scrub": (t2, 2.0)}
    specs = [(6, 6, "npo"), (11, 5, None), (4, 7, "scrub"), (9, 6, "npo")]
    prompts = [rng.integers(3, cfg.vocab_size, p).tolist() for p, _, _ in specs]

    def eng(ads):
        return ServingEngine(
            params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32, adapters=ads)

    e = eng(adapters)
    got = e.drain([e.submit(p, m, adapter=a)
                   for p, (_, m, a) in zip(prompts, specs)])

    for i, (p, (_, m, a)) in enumerate(zip(prompts, specs)):
        solo = eng(adapters)
        want = solo.drain([solo.submit(p, m, adapter=a)])[0]
        assert got[i] == want, f"request {i} adapter={a}"

    # non-vacuous: the adapters actually change the streams
    base = eng(adapters)
    base_out = base.drain([base.submit(prompts[0], specs[0][1])])[0]
    assert got[0] != base_out


def test_engine_adapter_with_speculation_and_prefix():
    """Adapters compose with the other serving features; prefix slabs are
    adapter-bound (prefilled through the adapter, mismatches rejected)."""
    import pytest

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(5))
    adapters = {"npo": (t1, 2.0),
                "kl": (_trained_adapter(params, 4, jax.random.PRNGKey(9)), 1.0)}
    system = rng.integers(3, cfg.vocab_size, 9).tolist()
    sfx = rng.integers(3, cfg.vocab_size, 6).tolist()

    def eng(k=0):
        return ServingEngine(
            params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            adapters=adapters, speculate_k=k)

    e0 = eng(0)
    want = e0.drain([e0.submit(system + sfx, 7, adapter="npo")])
    e1 = eng(4)
    assert e1.drain([e1.submit(system + sfx, 7, adapter="npo")]) == want
    e2 = eng(0)
    pid = e2.register_prefix(system, adapter="npo")
    assert e2.drain([e2.submit(sfx, 7, prefix=pid)]) == want  # inherits adapter
    with pytest.raises(ValueError):
        e2.submit(sfx, 7, prefix=pid, adapter="kl")  # kl vs npo-built prefix
    with pytest.raises(KeyError):
        e2.submit(sfx, 7, adapter="unknown")


def test_adapter_save_load_roundtrip(tmp_path):
    cfg, params = tiny_decoder()
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(7))
    from multimodal_unlearning_tpu.train.checkpoints import load_adapter, save_adapter

    save_adapter(tmp_path / "ad", t1, 2.0, meta={"forget_loss": "npo"})
    tree, scale = load_adapter(tmp_path / "ad")
    assert scale == 2.0
    la, lb = jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(tree)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bank_without_ids_raises():
    cfg, params = tiny_decoder()
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(8))
    bank = lora_lib.stack_adapters([t1, t1, t1], [1.0, 1.0, 1.0])
    import pytest

    with pytest.raises(ValueError, match="lora_ids"):
        llama.forward(params, cfg,
                      jnp.zeros((3, 4), jnp.int32), lora=bank, lora_scale=1.0)


def test_engine_vlm_adapters_with_projector():
    """LLaVA adapters include the projector bank — image prefills route
    per-request adapters through the projector too."""
    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    params = llava.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    t1 = _trained_adapter(params, 4, jax.random.PRNGKey(6))
    assert "projector" in t1
    # scale large enough to flip a degenerate random-init greedy loop —
    # the non-vacuous check below needs the delta to actually steer argmax
    adapters = {"ft": (t1, 40.0)}
    n_img = cfg.num_image_tokens
    img = rng.normal(size=(cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    prompt = [cfg.image_token_id] * n_img + rng.integers(
        3, cfg.decoder.vocab_size, 6).tolist()

    def run(adapter):
        e = ServingEngine(
            params, cfg, "llava", num_slots=2, max_len=128, chunk=3,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            adapters=adapters)
        reqs = [e.submit(prompt, 5, pixel_values=img, adapter=adapter)]
        return e.drain(reqs)[0]

    ft, base = run("ft"), run(None)
    assert ft != base  # projector + decoder adapters steer the stream
    # mixed batch: both rows exactly reproduce their solo runs
    e = ServingEngine(
        params, cfg, "llava", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, adapters=adapters)
    r1 = e.submit(prompt, 5, pixel_values=img, adapter="ft")
    r2 = e.submit(prompt, 5, pixel_values=img)
    got = e.drain([r1, r2])
    assert got == [ft, base]
