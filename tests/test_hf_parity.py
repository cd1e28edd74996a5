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
