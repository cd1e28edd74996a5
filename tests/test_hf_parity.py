"""Architecture parity vs Hugging Face torch implementations.

Constructs torch-side HF models (random init, no hub access) with matching
configs, imports their weights through the HF bridge, and compares logits /
hidden states — proving RoPE convention, norm placement, GQA wiring and
bridge key mapping are exactly HF-compatible (SURVEY.md §7 hard part #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_unlearning_tpu.models import hf_bridge, llama, vit


@pytest.fixture(scope="module")
def hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return cfg, model


def test_llama_logits_match_hf(hf_llama):
    hf_cfg, hf_model = hf_llama
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    ours_cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2,
        rope_theta=10000.0, max_position_embeddings=256, rms_norm_eps=1e-5,
    )
    params = jax.tree.map(jnp.asarray, hf_bridge.llama_from_hf(sd, 2))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(
        llama.forward(params, ours_cfg, jnp.asarray(ids), compute_dtype=jnp.float32)["logits"]
    )
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-4)


def test_llama_left_padding_matches_hf(hf_llama):
    hf_cfg, hf_model = hf_llama
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    ours_cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    params = jax.tree.map(jnp.asarray, hf_bridge.llama_from_hf(sd, 2))

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 256, (1, 16))
    ids[0, :5] = 0
    mask = np.ones((1, 16), np.int64)
    mask[0, :5] = 0
    with torch.no_grad():
        hf_logits = hf_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    ours = np.asarray(
        llama.forward(
            params, ours_cfg, jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), compute_dtype=jnp.float32,
        )["logits"]
    )
    # compare only valid positions (padding rows are don't-care)
    np.testing.assert_allclose(ours[0, 5:], hf_logits[0, 5:], atol=2e-4, rtol=2e-4)


def _gpt_arch(decoder, **over):
    arch = dict(
        decoder=decoder, vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        max_position_embeddings=256, layer_norm_eps=1e-5,
    )
    arch.update(over)
    return arch


def _compare_decoder_logits(hf_model, arch, from_hf, ids, mask=None, atol=3e-4):
    from multimodal_unlearning_tpu.models import gpt_decoder

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = gpt_decoder.GptConfig.from_registry(arch)
    params = jax.tree.map(jnp.asarray, from_hf(sd))
    kw = {}
    t_kw = {}
    if mask is not None:
        kw["attention_mask"] = jnp.asarray(mask)
        t_kw["attention_mask"] = torch.tensor(mask)
    with torch.no_grad():
        want = hf_model(torch.tensor(ids), **t_kw).logits.numpy()
    got = np.asarray(
        gpt_decoder.forward(params, cfg, jnp.asarray(ids), compute_dtype=jnp.float32, **kw)["logits"]
    )
    if mask is not None:
        got, want = got[mask.astype(bool)], want[mask.astype(bool)]
    np.testing.assert_allclose(got, want, atol=atol, rtol=atol)


def test_neox_logits_match_hf():
    """pythia family: parallel residual + fused QKV + partial rotary
    (reference loads GPTNeoXForCausalLM, config/model_config.yaml:36-47)."""
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hf_cfg = GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=256, layer_norm_eps=1e-5,
        use_parallel_residual=True, tie_word_embeddings=False,
        attn_implementation="eager", hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = GPTNeoXForCausalLM(hf_cfg).eval()
    ids = np.random.default_rng(0).integers(0, 256, (2, 12))
    _compare_decoder_logits(
        model, _gpt_arch("neox", rotary_pct=0.25),
        lambda sd: hf_bridge.neox_from_hf(sd, 2, 4), ids,
    )


def test_neox_left_padding_matches_hf():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hf_cfg = GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=256, layer_norm_eps=1e-5,
        use_parallel_residual=True, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = GPTNeoXForCausalLM(hf_cfg).eval()
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 256, (2, 16))
    mask = np.ones((2, 16), np.int64)
    mask[0, :5] = 0
    mask[1, :2] = 0
    _compare_decoder_logits(
        model, _gpt_arch("neox", rotary_pct=0.25),
        lambda sd: hf_bridge.neox_from_hf(sd, 2, 4), ids, mask=mask,
    )


def test_phi_logits_match_hf():
    """phi family: single-LN parallel residual, gelu_new, lm_head bias
    (reference config/model_config.yaml:13-21)."""
    from transformers import PhiConfig, PhiForCausalLM

    hf_cfg = PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, rope_theta=10000.0,
        max_position_embeddings=256, layer_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager",
        hidden_act="gelu_new",
    )
    torch.manual_seed(0)
    model = PhiForCausalLM(hf_cfg).eval()
    ids = np.random.default_rng(2).integers(0, 256, (2, 12))
    _compare_decoder_logits(
        model, _gpt_arch("phi", rotary_pct=0.5),
        lambda sd: hf_bridge.phi_from_hf(sd, 2), ids,
    )


def test_stablelm_logits_match_hf():
    """stablelm family: sequential residual + LayerNorm + partial rotary +
    silu-gated MLP (reference config/model_config.yaml:24-33)."""
    from transformers import StableLmConfig, StableLmForCausalLM

    hf_cfg = StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.25, rope_theta=10000.0,
        max_position_embeddings=256, layer_norm_eps=1e-5,
        use_qkv_bias=False, use_parallel_residual=False,
        tie_word_embeddings=False, attn_implementation="eager",
        hidden_act="silu",
    )
    torch.manual_seed(0)
    model = StableLmForCausalLM(hf_cfg).eval()
    ids = np.random.default_rng(3).integers(0, 256, (2, 12))
    _compare_decoder_logits(
        model, _gpt_arch("stablelm", rotary_pct=0.25),
        lambda sd: hf_bridge.stablelm_from_hf(sd, 2), ids,
    )


def test_gpt_decoder_bridge_roundtrip():
    """to_hf ∘ from_hf is the identity for all three non-llama families."""
    from multimodal_unlearning_tpu.models import gpt_decoder

    for name, to_hf, from_hf in (
        ("neox", lambda p: hf_bridge.neox_to_hf(p, 4), lambda sd: hf_bridge.neox_from_hf(sd, 2, 4)),
        ("phi", hf_bridge.phi_to_hf, lambda sd: hf_bridge.phi_from_hf(sd, 2)),
        ("stablelm", hf_bridge.stablelm_to_hf, lambda sd: hf_bridge.stablelm_from_hf(sd, 2)),
    ):
        cfg = gpt_decoder.GptConfig.from_registry(_gpt_arch(name))
        params = gpt_decoder.init_params(cfg, jax.random.PRNGKey(0))
        back = from_hf(to_hf(jax.tree.map(np.asarray, params)))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params, back,
        )


def test_clip_vit_features_match_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        layer_norm_eps=1e-5, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    ours_cfg = vit.VitConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        patch_size=8, image_size=32, layer_norm_eps=1e-5,
    )
    params = jax.tree.map(
        jnp.asarray, hf_bridge.vit_from_hf(sd, 2, prefix="vision_model.")
    )

    rng = np.random.default_rng(0)
    # CLIPVisionModel expects NCHW; ours NHWC
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    for fl in (-1, -2):
        want = hf_out.hidden_states[fl].numpy()
        ours = np.asarray(
            vit.forward(params, ours_cfg, jnp.asarray(imgs), feature_layer=fl, compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(ours, want, atol=3e-4, rtol=3e-4, err_msg=f"feature_layer={fl}")


def _tiny_qwen2vl():
    """Matching (HF torch model, our config) pair for the true Qwen2-VL arch."""
    from transformers import Qwen2VLConfig as HFQwenVLConfig
    from transformers import Qwen2VLForConditionalGeneration

    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_cfg = HFQwenVLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=256, rms_norm_eps=1e-5,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            tie_word_embeddings=False, attn_implementation="eager",
        ),
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=2, in_channels=3, hidden_size=64,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            mlp_ratio=4.0, hidden_act="quick_gelu",
        ),
        image_token_id=250, video_token_id=253,
        vision_start_token_id=251, vision_end_token_id=252,
    )
    torch.manual_seed(0)
    hf_model = Qwen2VLForConditionalGeneration(hf_cfg).eval()

    ours_cfg = qwen2_vl.QwenVLConfig.from_registry(dict(
        decoder=dict(
            decoder="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=10000.0,
            max_position_embeddings=256, rms_norm_eps=1e-5,
            qkv_bias=True, mrope_section=[2, 3, 3],
        ),
        vision=dict(
            embed_dim=32, depth=2, num_heads=2, out_hidden_size=64,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            mlp_ratio=4.0, layer_norm_eps=1e-6, image_size=16,
        ),
        image_token_id=250, vision_start_token_id=251, vision_end_token_id=252,
    ))

    # 4.57 nests weights under model.{visual,language_model}; published
    # checkpoints (and our bridge) use the flat visual./model. layout — remap
    sd = {}
    for k, v in hf_model.state_dict().items():
        k2 = k
        if k2.startswith("model.visual."):
            k2 = "visual." + k2[len("model.visual."):]
        elif k2.startswith("model.language_model."):
            k2 = "model." + k2[len("model.language_model."):]
        sd[k2] = v.detach().numpy()
    params = jax.tree.map(jnp.asarray, hf_bridge.qwen2vl_from_hf(sd, 2, 2))
    return hf_model, ours_cfg, params


def _qwen_inputs(ours_cfg, rng, B=2, n_text_before=3, n_text_after=5, pad=(0, 0)):
    n_img = ours_cfg.num_image_tokens  # 4 at the 16px operating point
    S = n_text_before + 1 + n_img + 1 + n_text_after
    ids = rng.integers(1, 240, (B, S))
    mask = np.ones((B, S), np.int64)
    for b in range(B):
        p = pad[b] if b < len(pad) else 0
        ids[b, p + n_text_before] = 251  # vision_start
        ids[b, p + n_text_before + 1: p + n_text_before + 1 + n_img] = 250
        ids[b, p + n_text_before + 1 + n_img] = 252  # vision_end
        mask[b, :p] = 0
    patches = rng.normal(size=(B, 16, 96)).astype(np.float32)  # grid (1,4,4)
    return ids, mask, patches


def test_qwen2vl_full_assembly_matches_hf():
    """True Qwen2-VL parity: NaViT tower + PatchMerger + M-RoPE decoder vs
    torch Qwen2VLForConditionalGeneration (reference's default mm family,
    config/model_config.yaml:66-79)."""
    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_model, ours_cfg, params = _tiny_qwen2vl()
    rng = np.random.default_rng(0)
    ids, mask, patches = _qwen_inputs(ours_cfg, rng)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(patches.reshape(-1, 96)),
            image_grid_thw=torch.tensor([[1, 4, 4]] * len(ids)),
        ).logits.numpy()
    ours = np.asarray(
        qwen2_vl.forward(
            params, ours_cfg, jnp.asarray(ids),
            pixel_values=jnp.asarray(patches),
            attention_mask=jnp.asarray(mask),
            grid=(1, 4, 4), compute_dtype=jnp.float32,
        )["logits"]
    )
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-4)


def test_qwen2vl_left_padding_matches_hf():
    """M-RoPE position computation under left padding (mixed prompt lengths)."""
    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_model, ours_cfg, params = _tiny_qwen2vl()
    rng = np.random.default_rng(1)
    ids, mask, patches = _qwen_inputs(ours_cfg, rng, pad=(4, 0))

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(patches.reshape(-1, 96)),
            image_grid_thw=torch.tensor([[1, 4, 4]] * len(ids)),
        ).logits.numpy()
    ours = np.asarray(
        qwen2_vl.forward(
            params, ours_cfg, jnp.asarray(ids),
            pixel_values=jnp.asarray(patches),
            attention_mask=jnp.asarray(mask),
            grid=(1, 4, 4), compute_dtype=jnp.float32,
        )["logits"]
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid], atol=5e-4, rtol=5e-4)


def test_qwen2vl_bridge_roundtrip():
    from multimodal_unlearning_tpu.models import qwen2_vl

    _, ours_cfg, params = _tiny_qwen2vl()
    back = hf_bridge.qwen2vl_from_hf(
        hf_bridge.qwen2vl_to_hf(jax.tree.map(np.asarray, params)), 2, 2
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=0),
        params, back,
    )


def _tiny_qwen25vl():
    """Matching (HF torch model, our config) pair for the true Qwen2.5-VL arch
    (reference qwen-vl-3b family, config/model_config.yaml:59-65): windowed
    RMSNorm+SwiGLU tower + M-RoPE Qwen2 decoder."""
    from transformers import Qwen2_5_VLConfig as HFQwen25VLConfig
    from transformers import Qwen2_5_VLForConditionalGeneration

    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_cfg = HFQwen25VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=256, rms_norm_eps=1e-5,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            tie_word_embeddings=False, attn_implementation="eager",
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
            in_channels=3, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, window_size=16, fullatt_block_indexes=[1],
            out_hidden_size=64, hidden_act="silu",
        ),
        image_token_id=250, video_token_id=253,
        vision_start_token_id=251, vision_end_token_id=252,
    )
    torch.manual_seed(0)
    hf_model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()

    ours_cfg = qwen2_vl.QwenVLConfig.from_registry(dict(
        decoder=dict(
            decoder="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=10000.0,
            max_position_embeddings=256, rms_norm_eps=1e-5,
            qkv_bias=True, mrope_section=[2, 3, 3],
        ),
        vision=dict(
            version="2.5", embed_dim=32, depth=2, num_heads=2,
            out_hidden_size=64, intermediate_size=48, patch_size=4,
            spatial_merge_size=2, temporal_patch_size=2, window_size=16,
            fullatt_block_indexes=[1], layer_norm_eps=1e-6, image_size=32,
        ),
        image_token_id=250, vision_start_token_id=251, vision_end_token_id=252,
    ))

    sd = {}
    for k, v in hf_model.state_dict().items():
        k2 = k
        if k2.startswith("model.visual."):
            k2 = "visual." + k2[len("model.visual."):]
        elif k2.startswith("model.language_model."):
            k2 = "model." + k2[len("model.language_model."):]
        sd[k2] = v.detach().numpy()
    params = jax.tree.map(jnp.asarray, hf_bridge.qwen2vl_from_hf(sd, 2, 2))
    return hf_model, ours_cfg, params


def _qwen25_inputs(rng, grid, B=2, n_text_before=3, n_text_after=5, pad=(0, 0)):
    t, h, w = grid
    n_img = t * h * w // 4  # merged tokens
    S = n_text_before + 1 + n_img + 1 + n_text_after
    ids = rng.integers(1, 240, (B, S))
    mask = np.ones((B, S), np.int64)
    for b in range(B):
        p = pad[b] if b < len(pad) else 0
        ids[b, p + n_text_before] = 251  # vision_start
        ids[b, p + n_text_before + 1: p + n_text_before + 1 + n_img] = 250
        ids[b, p + n_text_before + 1 + n_img] = 252  # vision_end
        mask[b, :p] = 0
    patches = rng.normal(size=(B, t * h * w, 96)).astype(np.float32)
    return ids, mask, patches


@pytest.mark.parametrize(
    "grid",
    [
        (1, 8, 8),  # merged 4x4, window 2x2 merged cells: uniform windows
        (1, 6, 6),  # merged 3x3: ragged windows (HF pads with -100, drops)
    ],
    ids=["uniform-windows", "ragged-windows"],
)
def test_qwen25vl_full_assembly_matches_hf(grid):
    """True Qwen2.5-VL parity (windowed tower + fullatt blocks + RMS/SwiGLU +
    merger un-permute) vs torch Qwen2_5_VLForConditionalGeneration."""
    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_model, ours_cfg, params = _tiny_qwen25vl()
    rng = np.random.default_rng(0)
    ids, mask, patches = _qwen25_inputs(rng, grid)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(patches.reshape(-1, 96)),
            image_grid_thw=torch.tensor([list(grid)] * len(ids)),
        ).logits.numpy()
    ours = np.asarray(
        qwen2_vl.forward(
            params, ours_cfg, jnp.asarray(ids),
            pixel_values=jnp.asarray(patches),
            attention_mask=jnp.asarray(mask),
            grid=grid, compute_dtype=jnp.float32,
        )["logits"]
    )
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-4)


def test_qwen25vl_left_padding_matches_hf():
    """M-RoPE positions + windowed tower under left padding."""
    from multimodal_unlearning_tpu.models import qwen2_vl

    hf_model, ours_cfg, params = _tiny_qwen25vl()
    rng = np.random.default_rng(1)
    ids, mask, patches = _qwen25_inputs(rng, (1, 8, 8), pad=(4, 0))

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(patches.reshape(-1, 96)),
            image_grid_thw=torch.tensor([[1, 8, 8]] * len(ids)),
        ).logits.numpy()
    ours = np.asarray(
        qwen2_vl.forward(
            params, ours_cfg, jnp.asarray(ids),
            pixel_values=jnp.asarray(patches),
            attention_mask=jnp.asarray(mask),
            grid=(1, 8, 8), compute_dtype=jnp.float32,
        )["logits"]
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid], atol=5e-4, rtol=5e-4)


def test_qwen25vl_bridge_roundtrip():
    _, ours_cfg, params = _tiny_qwen25vl()
    back = hf_bridge.qwen2vl_from_hf(
        hf_bridge.qwen2vl_to_hf(jax.tree.map(np.asarray, params)), 2, 2
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=0),
        params, back,
    )


def test_llava_full_assembly_matches_hf():
    """End-to-end VLM parity: HF LlavaForConditionalGeneration (torch) vs our
    assembly through the bridge — validates the projector, feature-layer
    selection, and image-token splice semantics together."""
    from transformers import LlavaConfig as HFLlavaConfig, LlavaForConditionalGeneration

    from multimodal_unlearning_tpu.models import llava

    hf_cfg = HFLlavaConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            layer_norm_eps=1e-5, attn_implementation="eager",
        ),
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
            attn_implementation="eager",
        ),
        image_token_index=250, vision_feature_layer=-2,
        vision_feature_select_strategy="default", projector_hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf_model = LlavaForConditionalGeneration(hf_cfg).eval()

    # current transformers nests everything under "model."; published llava
    # checkpoints (and our bridge) use the original flat layout — remap
    sd = {}
    for k, v in hf_model.state_dict().items():
        k2 = k
        if k2.startswith("model.language_model."):
            k2 = "language_model.model." + k2[len("model.language_model."):]
        elif k2 == "lm_head.weight":
            k2 = "language_model.lm_head.weight"
        elif k2.startswith("model."):
            k2 = k2[len("model."):]
        sd[k2] = v.detach().numpy()

    params = jax.tree.map(jnp.asarray, hf_bridge.llava_from_hf(sd, 2, 2))

    ours_cfg = llava.LlavaConfig(
        decoder=llama.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2,
        ),
        vision=vit.VitConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
            patch_size=8, image_size=32,
        ),
        image_token_id=250, vision_feature_layer=-2, vision_feature_select="patch",
    )

    rng = np.random.default_rng(0)
    n_img = ours_cfg.num_image_tokens
    ids = rng.integers(0, 200, (2, n_img + 8))
    ids[:, :n_img] = 250
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
        ).logits.numpy()
    ours = np.asarray(
        llava.forward(
            params, ours_cfg, jnp.asarray(ids),
            pixel_values=jnp.asarray(imgs), compute_dtype=jnp.float32,
        )["logits"]
    )
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-4)
