"""Model-layer tests: decoder semantics, KV-cache decode parity, LoRA,
activation capture, VLM splice, ResNet/AdMSoftmax."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama, llava, lora, resnet, vit


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def tiny_vlm():
    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    params = llava.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_decoder_forward_shapes_and_finite():
    cfg, params = tiny_decoder()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)))
    out = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)
    assert out["logits"].shape == (2, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_decoder_causality():
    """Changing a future token must not affect past logits."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)))
    ids2 = ids.at[0, 10].set((ids[0, 10] + 1) % cfg.vocab_size)
    l1 = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    l2 = llama.forward(params, cfg, ids2, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(l1[:, :10]), np.asarray(l2[:, :10]), atol=1e-5)
    assert np.abs(np.asarray(l1[:, 10:]) - np.asarray(l2[:, 10:])).max() > 1e-4


def test_left_padding_matches_unpadded():
    """Left-padded row must produce the same logits on real tokens."""
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(2)
    real = rng.integers(1, cfg.vocab_size, (1, 12))
    ids_pad = np.zeros((1, 16), np.int64)
    ids_pad[0, 4:] = real
    mask = np.zeros((1, 16), np.int64)
    mask[0, 4:] = 1
    out_pad = llama.forward(
        params, cfg, jnp.asarray(ids_pad), attention_mask=jnp.asarray(mask), compute_dtype=jnp.float32
    )["logits"]
    out_ref = llama.forward(params, cfg, jnp.asarray(real), compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(out_pad[0, 4:]), np.asarray(out_ref[0]), atol=1e-4)


def test_kv_cache_decode_matches_full_forward():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(3)
    S, Smax = 8, 16
    ids = rng.integers(1, cfg.vocab_size, (1, S))

    full = llama.forward(params, cfg, jnp.asarray(ids), compute_dtype=jnp.float32)["logits"]

    # prefill into cache then decode one more token
    cache = llama.init_kv_cache(cfg, 1, Smax, dtype=jnp.float32)
    kv_valid = np.zeros((1, Smax), np.int64)
    kv_valid[0, :S] = 1
    out = llama.forward(
        params, cfg, jnp.asarray(ids),
        kv_cache=cache, cache_offset=0,
        kv_valid_mask=jnp.asarray(kv_valid),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(full), atol=1e-4)

    # decode: next token at position S
    nxt = jnp.asarray([[int(ids[0, -1])]])
    kv_valid2 = kv_valid.copy()
    kv_valid2[0, S] = 1
    dec = llama.forward(
        params, cfg, nxt,
        kv_cache=out["kv_cache"], cache_offset=S,
        kv_valid_mask=jnp.asarray(kv_valid2),
        positions=jnp.asarray([[S]]),
        compute_dtype=jnp.float32,
    )["logits"]
    # reference: full forward over S+1 tokens
    ids_ext = np.concatenate([ids, ids[:, -1:]], axis=1)
    full_ext = llama.forward(params, cfg, jnp.asarray(ids_ext), compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(dec[0, 0]), np.asarray(full_ext[0, -1]), atol=1e-4)


def test_capture_layer_matches_block_output():
    cfg, params = tiny_decoder()
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (1, 8)))
    out = llama.forward(params, cfg, ids, capture_layer=0, compute_dtype=jnp.float32)
    assert out["captured"].shape == (1, 8, cfg.hidden_size)
    # layer-0 capture differs from embeddings and from final hidden
    emb = jnp.take(params["embed_tokens"], ids, axis=0)
    assert np.abs(np.asarray(out["captured"]) - np.asarray(emb)).max() > 1e-3


def test_lora_zero_b_is_identity_then_changes():
    cfg, params = tiny_decoder()
    ids = jnp.asarray(np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 8)))
    adapters = lora.init_lora(params["layers"], r=4, key=jax.random.PRNGKey(7))
    scale = lora.lora_scale(4, 32)
    base = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    with_lora = llama.forward(
        params, cfg, ids, lora=adapters, lora_scale=scale, compute_dtype=jnp.float32
    )["logits"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)

    # perturb B → output changes, and merge() reproduces the lora forward
    adapters["layers"]["q_proj"]["b"] = (
        jnp.ones_like(adapters["layers"]["q_proj"]["b"]) * 0.01
    )
    changed = llama.forward(
        params, cfg, ids, lora=adapters, lora_scale=scale, compute_dtype=jnp.float32
    )["logits"]
    assert np.abs(np.asarray(changed) - np.asarray(base)).max() > 1e-4
    merged = lora.merge(params, adapters, scale)
    merged_out = llama.forward(merged, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(changed), np.asarray(merged_out), atol=1e-4)


def test_greedy_generate_aot_layouts_matches():
    """AUTO-layout AOT decode (params device_put into the executable's
    preferred formats once) must emit the same tokens as the plain jit path."""
    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate

    cfg, params = tiny_decoder()
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    kw = dict(max_new_tokens=6, pad_token_id=0, eos_token_id=None,
              compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    plain = greedy_generate(params, cfg, ids, mask, **kw)
    aot = greedy_generate(params, cfg, ids, mask, aot_layouts=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(aot))
    # second call hits the cache (same params identity, same shapes)
    aot2 = greedy_generate(params, cfg, ids, mask, aot_layouts=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(aot2))
    # a SECOND AOT variant over the same (already-relayouted) weight tree —
    # e.g. switching KV-cache dtype — must compile against the weights'
    # current formats (AUTO again would fail to lower and would invalidate
    # the first executable's weight tree) and still emit matching tokens
    kw2 = dict(kw, cache_dtype=jnp.bfloat16)
    plain_c = greedy_generate(params, cfg, ids, mask, **kw2)
    aot_c = greedy_generate(params, cfg, ids, mask, aot_layouts=True, **kw2)
    np.testing.assert_array_equal(np.asarray(plain_c), np.asarray(aot_c))
    # and the FIRST executable still works after the second compile
    aot3 = greedy_generate(params, cfg, ids, mask, aot_layouts=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(aot3))


def test_projector_lora_identity_then_changes_and_merges():
    """Reference parity: LoRA adapts the VLM projector too (utils.py:10-19).
    b=0 adapters are identity; perturbing the projector adapter changes only
    image rows; merge_model reproduces the adapted forward."""
    cfg, params = tiny_vlm()
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(8)
    S = n_img + 8
    ids = rng.integers(0, 200, (2, S))
    ids[0, :n_img] = cfg.image_token_id  # row 0 image, row 1 text-only
    imgs = jnp.asarray(rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)

    adapters = lora.init_model_lora(params, 4, jax.random.PRNGKey(9))
    assert set(adapters) == {"language_model", "projector"}
    assert set(adapters["projector"]) == {"fc1", "fc2"}
    scale = lora.lora_scale(4, 32)

    kw = dict(pixel_values=imgs, compute_dtype=jnp.float32)
    base = llava.forward(params, cfg, jnp.asarray(ids), **kw)["logits"]
    with_lora = llava.forward(
        params, cfg, jnp.asarray(ids), lora=adapters, lora_scale=scale, **kw
    )["logits"]
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-5)

    adapters["projector"]["fc2"]["b"] = jnp.ones_like(adapters["projector"]["fc2"]["b"]) * 0.01
    changed = llava.forward(
        params, cfg, jnp.asarray(ids), lora=adapters, lora_scale=scale, **kw
    )["logits"]
    # only the image row sees the projector; the text-only row is untouched
    assert np.abs(np.asarray(changed[0]) - np.asarray(base[0])).max() > 1e-4
    np.testing.assert_allclose(np.asarray(changed[1]), np.asarray(base[1]), atol=1e-5)

    merged = lora.merge_model(params, adapters, scale)
    merged_out = llava.forward(merged, cfg, jnp.asarray(ids), **kw)["logits"]
    np.testing.assert_allclose(np.asarray(changed), np.asarray(merged_out), atol=1e-4)

    # init_model_lora(projector=False) keeps the old decoder-only target set
    dec_only = lora.init_model_lora(params, 4, jax.random.PRNGKey(9), projector=False)
    assert "projector" not in dec_only


def test_vit_feature_layer_shapes():
    arch = get_model_identifiers("tiny-llava-test").arch.vision
    cfg = vit.VitConfig.from_registry(arch)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    f_last = vit.forward(params, cfg, imgs, feature_layer=-1, compute_dtype=jnp.float32)
    f_pen = vit.forward(params, cfg, imgs, feature_layer=-2, compute_dtype=jnp.float32)
    assert f_last.shape == (2, cfg.seq_len, cfg.hidden_size)
    assert np.abs(np.asarray(f_last) - np.asarray(f_pen)).max() > 1e-5


def test_llava_splice_and_mixed_batch():
    cfg, params = tiny_vlm()
    n_img = cfg.num_image_tokens
    V = cfg.decoder.vocab_size
    rng = np.random.default_rng(6)
    S = n_img + 8
    # row 0 has an image (expanded tokens at the front), row 1 text-only
    ids = rng.integers(0, 200, (2, S))
    ids[0, :n_img] = cfg.image_token_id
    imgs = rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3))
    out = llava.forward(
        params, cfg, jnp.asarray(ids), pixel_values=jnp.asarray(imgs, jnp.float32),
        compute_dtype=jnp.float32,
    )
    assert out["logits"].shape == (2, S, V)
    # row 1 (no image tokens) must equal a pure-text forward
    text_out = llama.forward(
        params["language_model"], cfg.decoder, jnp.asarray(ids[1:]), compute_dtype=jnp.float32
    )["logits"]
    np.testing.assert_allclose(np.asarray(out["logits"][1]), np.asarray(text_out[0]), atol=1e-4)
    # changing the image changes row 0 logits
    imgs2 = imgs.copy()
    imgs2[0] += 1.0
    out2 = llava.forward(
        params, cfg, jnp.asarray(ids), pixel_values=jnp.asarray(imgs2, jnp.float32),
        compute_dtype=jnp.float32,
    )
    assert np.abs(np.asarray(out2["logits"][0]) - np.asarray(out["logits"][0])).max() > 1e-4
    np.testing.assert_allclose(np.asarray(out2["logits"][1]), np.asarray(out["logits"][1]), atol=1e-5)


def test_resnet_adms():
    cfg = resnet.ResNetConfig(widths=(8, 16, 16, 32), small_inputs=True)
    params, state = resnet.init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    emb, new_state = resnet.forward(params, state, cfg, x, train=True)
    assert emb.shape == (4, 32)
    head = resnet.adms_init(32, 10, jax.random.PRNGKey(1))
    labels = jnp.asarray([0, 1, 2, 3])
    loss = resnet.adms_loss(head, emb, labels)
    assert np.isfinite(float(loss))
    # reference default: W unnormalized (cv/AdMSLoss.py:26-27 no-op loop) —
    # logits are x̂·W, bounded by the column norms, not by 1
    logits = resnet.adms_logits(head, emb)
    assert logits.shape == (4, 10)
    wnorm = np.linalg.norm(np.asarray(head["weight"]), axis=0).max()
    assert np.abs(np.asarray(logits)).max() <= wnorm + 1e-5
    # normalize_w=True is the textbook cosine form: bounded by 1
    cos = resnet.adms_logits(head, emb, normalize_w=True)
    assert np.abs(np.asarray(cos)).max() <= 1.0 + 1e-5


def test_gpt_decoder_generate_int8_cache():
    """pythia/phi-family decode through the shared stacked-cache write +
    flash-decode fallback, bf16 vs int8 KV cache (models/llama._cache_write):
    greedy tokens must agree on a random tiny model."""
    import jax
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
    from multimodal_unlearning_tpu.models import gpt_decoder

    cfg = gpt_decoder.GptConfig.from_registry(dict(
        decoder="neox", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rotary_pct=0.25,
    ))
    params = gpt_decoder.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, (2, 128)), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32)
    kw = dict(max_new_tokens=6, pad_token_id=0, eos_token_id=None,
              compute_dtype=jnp.float32)
    g_f = greedy_generate(params, cfg, ids, mask, cache_dtype=jnp.float32, **kw)
    g_8 = greedy_generate(params, cfg, ids, mask, cache_dtype=jnp.int8, **kw)
    assert g_f.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_8))
