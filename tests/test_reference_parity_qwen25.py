"""Differential parity vs the INSTALLED torch reference — Qwen2.5-VL family.

The reference's qwen-vl-3b family loads HF ``Qwen2_5_VLForConditionalGeneration``
(/root/reference/config/model_config.yaml:59-65) and runs it through the very
same ``MMTrainerForgetting.compute_loss`` dispatch as LLaVA
(/root/reference/mm/trainer.py:168-483 — the trainer is model-agnostic).
tests/test_reference_parity.py proves the loss taxonomy on LLaVA; this file
proves the NEW family plugs into the same dispatch identically: loss values
and parameter gradients through the windowed RMS/SwiGLU tower + M-RoPE
decoder match the reference trainer running the torch model in-process.

Covers the three structural loss shapes: plain CE (retain_ft), combined
forget+retain (grad_diff), and teacher-resident (npo, KL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.models import hf_bridge
from multimodal_unlearning_tpu.train import losses as L

from tests.ref_parity_common import RefModelShim, make_ref_trainer

VOCAB = 256
IMAGE_TOKEN_ID = 250
GRID = (1, 8, 8)  # merged 4x4; window 2x2 merged cells (uniform partition)
DEC_LAYERS = 2
VIT_DEPTH = 2


def _build_hf_qwen25(seed: int):
    import torch
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=DEC_LAYERS, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            max_position_embeddings=256, rms_norm_eps=1e-5,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            tie_word_embeddings=False, attn_implementation="eager",
        ),
        vision_config=dict(
            depth=VIT_DEPTH, hidden_size=32, intermediate_size=48, num_heads=2,
            in_channels=3, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, window_size=16, fullatt_block_indexes=[1],
            out_hidden_size=64, hidden_act="silu",
        ),
        image_token_id=IMAGE_TOKEN_ID, video_token_id=253,
        vision_start_token_id=251, vision_end_token_id=252,
    )
    torch.manual_seed(seed)
    return Qwen2_5_VLForConditionalGeneration(cfg).eval()


def _ours_config():
    from multimodal_unlearning_tpu.models import qwen2_vl

    return qwen2_vl.QwenVLConfig.from_registry(dict(
        decoder=dict(
            decoder="llama", vocab_size=VOCAB, hidden_size=64,
            intermediate_size=128, num_layers=DEC_LAYERS, num_heads=4,
            num_kv_heads=2, rope_theta=10000.0, max_position_embeddings=256,
            rms_norm_eps=1e-5, qkv_bias=True, mrope_section=[2, 3, 3],
        ),
        vision=dict(
            version="2.5", embed_dim=32, depth=VIT_DEPTH, num_heads=2,
            out_hidden_size=64, intermediate_size=48, patch_size=4,
            spatial_merge_size=2, temporal_patch_size=2, window_size=16,
            fullatt_block_indexes=[1], layer_norm_eps=1e-6, image_size=32,
        ),
        image_token_id=IMAGE_TOKEN_ID,
        vision_start_token_id=251, vision_end_token_id=252,
    ))


def _flat_qwen_sd(hf_model, grads: bool = False):
    """Remap 4.57's model.{visual,language_model} nesting to the published
    flat visual./model. layout the bridge speaks; optionally map grads."""
    import torch

    sd = {}
    items = (
        [(k, p.grad if p.grad is not None else torch.zeros_like(p))
         for k, p in hf_model.named_parameters()]
        if grads else list(hf_model.state_dict().items())
    )
    for k, v in items:
        if k.startswith("model.visual."):
            k = "visual." + k[len("model.visual."):]
        elif k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        sd[k] = v.detach().cpu().numpy()
    return sd


def _bridge(hf_model, grads: bool = False):
    tree = hf_bridge.qwen2vl_from_hf(
        _flat_qwen_sd(hf_model, grads=grads), DEC_LAYERS, VIT_DEPTH
    )
    return tree if grads else jax.tree.map(jnp.asarray, tree)


def _make_split(rng, cfg, B=2, text_before=3, q_len=2, text_after=7):
    """Qwen-convention split: <vision_start> [img]*n <vision_end> text, with
    −100 labels over the image span and the first q_len text tokens."""
    n_img = GRID[0] * GRID[1] * GRID[2] // 4
    S = text_before + 1 + n_img + 1 + text_after
    ids = rng.integers(1, 240, (B, S))
    ids[:, text_before] = 251
    ids[:, text_before + 1: text_before + 1 + n_img] = IMAGE_TOKEN_ID
    ids[:, text_before + 1 + n_img] = 252
    labels = ids.copy()
    labels[:, : text_before + 2 + n_img + q_len] = -100
    mask = np.ones((B, S), np.int64)
    pix = rng.normal(size=(B, GRID[0] * GRID[1] * GRID[2], 96)).astype(np.float32)
    return {
        "input_ids": ids, "labels": labels, "attention_mask": mask,
        "pixel_values": pix,
    }


def _to_torch(batch: dict) -> dict:
    import torch

    out = {}
    for name, split in batch.items():
        t = {}
        B = split["input_ids"].shape[0]
        for k, v in split.items():
            if k == "pixel_values":
                t[k] = torch.tensor(v.reshape(-1, v.shape[-1]))
                t["image_grid_thw"] = torch.tensor([list(GRID)] * B)
            else:
                t[k] = torch.tensor(v)
        out[name] = t
    return out


@pytest.fixture(scope="module")
def shared():
    pytest.importorskip("torch")
    from multimodal_unlearning_tpu.models import qwen2_vl

    hf = _build_hf_qwen25(seed=0)
    hf_teacher = _build_hf_qwen25(seed=1)
    cfg = _ours_config()
    params = _bridge(hf)
    teacher_params = _bridge(hf_teacher)

    def fwd(p, split, capture_layer=None):
        out = qwen2_vl.forward(
            p, cfg, jnp.asarray(split["input_ids"]),
            attention_mask=jnp.asarray(split["attention_mask"]),
            pixel_values=jnp.asarray(split["pixel_values"]),
            grid=GRID, capture_layer=capture_layer, compute_dtype=jnp.float32,
        )
        return {"logits": out["logits"], "captured": out.get("captured")}

    def student_of(p):
        return lambda split, **kw: fwd(p, split, **kw)

    teacher = lambda split, **kw: fwd(teacher_params, split, **kw)  # noqa: E731
    return dict(
        hf=hf, hf_teacher=hf_teacher, cfg=cfg, params=params,
        student_of=student_of, teacher=teacher,
    )


def _grad_err(ref_tree, ours_tree):
    ref_leaves = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(ref_tree)
    }
    max_err, scale = 0.0, 0.0
    for k, v in jax.tree_util.tree_leaves_with_path(ours_tree):
        r = np.asarray(ref_leaves[jax.tree_util.keystr(k)], np.float32)
        o = np.asarray(v, np.float32)
        max_err = max(max_err, float(np.max(np.abs(r - o))))
        scale = max(scale, float(np.max(np.abs(r))))
    return max_err, scale


@pytest.mark.parametrize(
    "loss_type,beta",
    [
        ("retain_ft", 1.0),
        ("grad_diff_forget_ce_retain_ce", 1.0),
        ("npo", 0.4),
        ("KL", 1.0),
    ],
    ids=["retain_ft", "grad_diff", "npo", "KL"],
)
def test_qwen25_loss_and_grads_match_reference(shared, loss_type, beta):
    import zlib

    cfg = shared["cfg"]
    hf = shared["hf"]
    rng = np.random.default_rng(zlib.crc32(loss_type.encode()))
    batch = {s: _make_split(rng, cfg) for s in L.batch_return_pairs(loss_type)}

    needs_teacher = L.loss_needs_teacher(loss_type)
    tr = make_ref_trainer(
        loss_type,
        teacher=RefModelShim(shared["hf_teacher"]) if needs_teacher else None,
        beta=beta,
    )
    hf.zero_grad(set_to_none=True)
    ref_loss = tr.compute_loss(RefModelShim(hf), _to_torch(batch))
    ref_loss.backward()
    ref_val = float(ref_loss.detach())
    ref_grads = _bridge(hf, grads=True)

    def ours_loss(p):
        loss, _ = L.compute_forget_loss(
            loss_type, batch, student=shared["student_of"](p),
            teacher=shared["teacher"] if needs_teacher else None,
            beta=beta, dpo_fix=False,
        )
        return loss

    ours_val, ours_grads = jax.jit(jax.value_and_grad(ours_loss))(shared["params"])
    assert float(ours_val) == pytest.approx(ref_val, rel=2e-3, abs=2e-5), (
        f"{loss_type}: loss {float(ours_val)} vs reference {ref_val}"
    )
    err, scale = _grad_err(ref_grads, ours_grads)
    assert err <= 2e-3 * scale + 1e-6, (
        f"{loss_type}: grad max err {err:.3e} vs ref scale {scale:.3e}"
    )
