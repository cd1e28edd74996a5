"""Int8 frozen-weight quantization: accuracy, memory, QLoRA training, teacher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from multimodal_unlearning_tpu.models import llama, lora
from multimodal_unlearning_tpu.train import optim, trainer
from multimodal_unlearning_tpu.utils.quantize import (
    dequantize_leaf,
    quantize_leaf,
    quantize_tree,
    tree_nbytes,
)


def big_decoder():
    # big enough that matmul weights pass the >=256 quantization gate
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(512, 256)), jnp.float32)
    qt = quantize_leaf(w)
    assert qt["q"].dtype == jnp.int8 and qt["s"].shape == (1, 256)
    back = dequantize_leaf(qt, jnp.float32)
    # per-channel int8: max error bounded by scale/2 per channel
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(qt["s"][0]) * 0.51
    assert (err <= bound[None, :]).all()


def test_quantize_tree_selective():
    cfg, params = big_decoder()
    qp = quantize_tree(params)
    # norms untouched, matmul weights quantized, memory roughly halved
    assert not isinstance(qp["norm"], dict)
    assert not isinstance(qp["layers"]["input_layernorm"], dict)
    assert isinstance(qp["layers"]["q_proj"], dict)
    assert isinstance(qp["embed_tokens"], dict)
    assert tree_nbytes(qp) < 0.45 * tree_nbytes(params)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_tree_inplace_matches_and_frees(bits):
    """quantize_tree_inplace (the HBM-safe path every CLI uses via
    quantize_base_params) must produce exactly quantize_tree's leaves while
    deleting each source buffer — the 7B e2e pipeline OOMed on the
    whole-tree variant (bf16 + int8 resident at once)."""
    from multimodal_unlearning_tpu.utils.quantize import quantize_tree_inplace

    _, params = big_decoder()
    ref = quantize_tree(params, bits=bits)
    victim = jax.tree.map(jnp.copy, params)
    big_leaves = [
        v for v in jax.tree.leaves(victim)
        if v.ndim >= 2 and v.shape[-1] >= 256 and v.shape[-2] >= 256
    ]
    assert big_leaves, "fixture must have quantizable leaves"
    out = quantize_tree_inplace(victim, bits=bits)
    assert out is victim  # mutated in place and returned
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(v.is_deleted() for v in big_leaves)


def test_quantized_forward_close():
    cfg, params = big_decoder()
    qp = quantize_tree(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)))
    full = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    quant = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    # logits agree in ranking most of the time and are numerically close
    denom = np.abs(np.asarray(full)).max()
    rel = np.abs(np.asarray(full - quant)).max() / denom
    assert rel < 0.15
    agree = (np.asarray(full.argmax(-1)) == np.asarray(quant.argmax(-1))).mean()
    assert agree > 0.8


def test_qlora_training_with_quantized_base_and_teacher():
    """NPO with int8 frozen base + int8 teacher + bf16 LoRA adapters."""
    cfg, params = big_decoder()
    qbase = quantize_tree(params)
    qteacher = quantize_tree(jax.tree.map(lambda x: x, params))
    adapters = lora.init_lora(
        {k: v for k, v in params["layers"].items()}, r=4, key=jax.random.PRNGKey(2)
    )
    scale = lora.lora_scale(4, 32)

    def apply_fn(p, part, capture_layer=None):
        if isinstance(p, tuple):
            base, tr = p
            kw = dict(lora=tr, lora_scale=scale)
        else:
            base, kw = p, {}
        out = llama.forward(
            base, cfg, jnp.asarray(part["input_ids"]),
            capture_layer=capture_layer, compute_dtype=jnp.float32, **kw,
        )
        return {"logits": out["logits"], "captured": out["captured"]}

    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.vocab_size, (2, 16))
    batch = {
        s: {"input_ids": ids, "labels": ids, "attention_mask": np.ones_like(ids)}
        for s in ("forget", "retain")
    }
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type="npo", beta=1.0, donate=False,
        combine=lambda tr, fr: (fr, tr),
    )
    state = trainer.create_train_state(adapters, tx)
    state, metrics = step(state, qbase, qteacher, batch)
    # student == teacher at init → NPO starts at exactly (2/beta)·log 2
    assert float(metrics["loss"]) == pytest.approx(2 * np.log(2), rel=1e-4)
    state, metrics = step(state, qbase, qteacher, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_int8_matmul_group_matches_single():
    """Grouped W8A8 (one activation quantization for q/k/v) must equal the
    per-projection int8_matmul exactly — same quantized activations, same
    int8 MXU accumulation — and its backward must sum the dx contributions."""
    from multimodal_unlearning_tpu.utils.quantize import int8_matmul, int8_matmul_group

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 32, 256)), jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(256, n)), jnp.float32) for n in (256, 128, 128)]
    qts = [quantize_leaf(w) for w in ws]
    qs = tuple(q["q"] for q in qts)
    ss = tuple(q["s"] for q in qts)

    ys = int8_matmul_group(x, qs, ss)
    for y, qt in zip(ys, qts):
        ref = int8_matmul(x, qt["q"], qt["s"])
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    def loss_group(x):
        return sum(jnp.sum(y**2) for y in int8_matmul_group(x, qs, ss))

    def loss_single(x):
        return sum(jnp.sum(int8_matmul(x, q["q"], q["s"]) ** 2) for q in qts)

    gx_g = jax.grad(loss_group)(x)
    gx_s = jax.grad(loss_single)(x)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_s), rtol=1e-5, atol=1e-4)


def test_int8_bwd_dx_close_and_exact_scale_algebra():
    """int8 dx backward: the (dy·s)-fold + per-row requantize must reproduce
    the exact int8 arithmetic, and land close to the dequantized bf16 dx."""
    from multimodal_unlearning_tpu.utils import quantize as qz

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    qt = quantize_leaf(w)

    def loss(x):
        return jnp.sum(qz.int8_matmul(x, qt["q"], qt["s"]) ** 2)

    dx_f32 = jax.grad(loss)(x)
    qz.enable_int8_bwd(True)
    try:
        dx_int8 = jax.grad(loss)(x)

        # exact algebra: replicate _int8_dx by hand
        y = qz.int8_matmul(x, qt["q"], qt["s"])
        dy = 2.0 * y
        dys = np.asarray(dy, np.float32) * np.asarray(qt["s"]).reshape(-1)
        a = np.abs(dys).max(axis=-1, keepdims=True)
        sdy = np.where(a > 0, a / 127.0, 1.0)
        dq = np.clip(np.round(dys / sdy), -127, 127).astype(np.int32)
        expect = (dq @ np.asarray(qt["q"], np.int32).T).astype(np.float32) * sdy
        np.testing.assert_allclose(np.asarray(dx_int8), expect, rtol=1e-5, atol=1e-3)
    finally:
        qz.enable_int8_bwd(False)

    # statistical closeness to the bf16 dequant backward: high cosine sim
    num = float(jnp.sum(dx_f32 * dx_int8))
    den = float(jnp.linalg.norm(dx_f32) * jnp.linalg.norm(dx_int8))
    assert num / den > 0.999


def test_int8_bwd_group_matches_sum_of_singles():
    from multimodal_unlearning_tpu.utils import quantize as qz

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    qts = [quantize_leaf(jnp.asarray(rng.normal(size=(256, n)), jnp.float32)) for n in (256, 128)]
    qs = tuple(t["q"] for t in qts)
    ss = tuple(t["s"] for t in qts)

    qz.enable_int8_bwd(True)
    try:
        g_group = jax.grad(
            lambda x: sum(jnp.sum(y**2) for y in qz.int8_matmul_group(x, qs, ss))
        )(x)
        g_single = jax.grad(
            lambda x: sum(jnp.sum(qz.int8_matmul(x, t["q"], t["s"]) ** 2) for t in qts)
        )(x)
    finally:
        qz.enable_int8_bwd(False)
    np.testing.assert_allclose(np.asarray(g_group), np.asarray(g_single), rtol=1e-5, atol=1e-4)


def test_int8_compute_path():
    """W8A8 opt-in: close to the dequant path, straight-through grads flow."""
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute

    cfg, params = big_decoder()
    qp = quantize_tree(params)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 16)))
    base = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    try:
        enable_int8_compute(True)
        w8a8 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
        # LoRA grads still flow through int8 matmuls (STE backward)
        adapters = lora.init_lora(params["layers"], r=4, key=jax.random.PRNGKey(5))
        adapters["layers"]["q_proj"]["b"] = adapters["layers"]["q_proj"]["b"] + 0.01

        def loss(ad):
            out = llama.forward(qp, cfg, ids, lora=ad, lora_scale=1.0, compute_dtype=jnp.float32)
            return jnp.sum(out["logits"] ** 2)

        g = jax.grad(loss)(adapters)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
        assert max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g)) > 0
    finally:
        enable_int8_compute(False)
    denom = np.abs(np.asarray(base)).max()
    assert np.abs(np.asarray(base - w8a8)).max() / denom < 0.25


def test_lora_merge_with_quantized_base_saves_dense():
    """QLoRA save path: merging adapters into an int8-quantized base must
    dequantize every QTensor leaf and return a dense, saveable tree."""
    from multimodal_unlearning_tpu.models import lora
    from multimodal_unlearning_tpu.utils.quantize import is_qtensor

    cfg, params = big_decoder()
    qp = quantize_tree(params)
    adapters = lora.init_lora(qp["layers"], 4, jax.random.PRNGKey(2))
    merged = lora.merge(qp, adapters, lora.lora_scale(4, 32))
    assert not any(is_qtensor(x) for x in jax.tree.leaves(merged, is_leaf=is_qtensor))
    # zero-init B ⇒ merged == dequantized base exactly
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_proj"], np.float32),
        np.asarray(dequantize_leaf(qp["layers"]["q_proj"], jnp.float32)),
        rtol=0, atol=1e-6,
    )
    # embed/lm_head (not LoRA-targeted) also dense
    assert hasattr(merged["embed_tokens"], "dtype")
    assert hasattr(merged["lm_head"], "dtype")


def test_lora_merge_consume_matches_and_frees():
    """merge(consume=True) — the end-of-run streaming path every CLI uses at
    7B — must produce leaves bit-identical to the default path AND delete
    every source buffer of the quantized base (the whole point: the int8
    tree and its dense copy are never co-resident)."""
    from multimodal_unlearning_tpu.models import lora
    from multimodal_unlearning_tpu.utils.quantize import is_qtensor

    cfg, params = big_decoder()
    qp = quantize_tree(params)
    qp2 = quantize_tree(params)  # second copy: consume destroys its input
    adapters = lora.init_lora(qp["layers"], 4, jax.random.PRNGKey(2))
    # nonzero B so the fold itself is exercised, not just the dequant
    adapters = jax.tree.map(
        lambda x: x + 0.01 if x.shape[-1] != 4 else x, adapters)
    scale = lora.lora_scale(4, 32)
    qsrc = [l for node in jax.tree.leaves(qp2, is_leaf=is_qtensor)
            if is_qtensor(node) for l in jax.tree.leaves(node)]
    assert qsrc
    want = lora.merge(qp, adapters, scale)
    got = lora.merge(qp2, adapters, scale, consume=True)
    assert jax.tree.structure(want) == jax.tree.structure(got)
    jax.tree.map(
        lambda w, g: np.testing.assert_array_equal(np.asarray(w), np.asarray(g)),
        want, got)
    # every quantized source buffer is dead
    assert all(l.is_deleted() for l in qsrc if isinstance(l, jax.Array))
    # list containers refuse loudly rather than silently skipping
    qp3 = quantize_tree(params)
    qp3["layers"]["as_list"] = [jnp.zeros((4, 4))]
    with np.testing.assert_raises(TypeError):
        lora.merge(qp3, adapters, scale, consume=True)


# ---------------------------------------------------------------------------
# int4 (W4A16): grouped scales along the contracting dim — half the int8
# weight stream again.  Decode is weight-bandwidth-bound (BASELINE.md), so
# int4 is the long-context / big-batch memory lever.
# ---------------------------------------------------------------------------

from multimodal_unlearning_tpu.utils.quantize import (  # noqa: E402
    dequantize_tree,
    embed_lookup,
    quantize_leaf_int4,
)


def test_int4_roundtrip_error_and_layout():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(512, 256)), jnp.float32)
    qt = quantize_leaf_int4(w, group_size=128)
    # nibble-packed int8 pairs along the contracting dim — no s4 arrays
    assert qt["q4"].dtype == jnp.int8 and qt["q4"].shape == (256, 256)
    assert qt["s"].shape == (4, 256)  # 512/128 groups x out channels
    back = np.asarray(dequantize_leaf(qt, jnp.float32)).reshape(4, 128, 256)
    err = np.abs(back - np.asarray(w).reshape(4, 128, 256))
    bound = np.asarray(qt["s"])[:, None, :] * 0.51  # |err| <= scale/2 per group
    assert (err <= bound).all()


def test_int4_group_size_falls_back_to_divisor():
    # groups must divide the half-split dim: for in=300, half=150 and the
    # largest divisor of 150 that is <= 128 is 75 -> 4 groups of 75
    w = jnp.asarray(np.random.default_rng(1).normal(size=(300, 256)), jnp.float32)
    qt = quantize_leaf_int4(w, group_size=128)
    assert qt["s"].shape == (4, 256)
    assert np.isfinite(np.asarray(dequantize_leaf(qt, jnp.float32))).all()


def test_int4_embed_lookup_matches_dequant_then_take():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(512, 256)), jnp.float32)
    qt = quantize_leaf_int4(table, group_size=128)
    ids = jnp.asarray(rng.integers(0, 512, (2, 16)), jnp.int32)
    via_lookup = embed_lookup(qt, ids)
    via_dense = jnp.take(dequantize_leaf(qt, jnp.float32), ids, axis=0)
    np.testing.assert_allclose(
        np.asarray(via_lookup), np.asarray(via_dense), rtol=0, atol=1e-6)


def test_int4_forward_exactly_matches_dequantized_tree():
    """The W4A16 forward dequantizes per layer under the scan — it must be
    bit-identical to forwarding a pre-dequantized dense copy of the tree."""
    cfg, params = big_decoder()
    qp = quantize_tree(params, bits=4)
    assert qp["layers"]["q_proj"]["q4"].dtype == jnp.int8
    assert not isinstance(qp["norm"], dict)  # small leaves stay float
    dense_copy = dequantize_tree(qp, jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 16)))
    a = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    b = llama.forward(dense_copy, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_int4_forward_close_to_full_precision():
    cfg, params = big_decoder()
    qp = quantize_tree(params, bits=4)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 16)))
    full = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    q4 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    rel = np.abs(np.asarray(full - q4)).max() / np.abs(np.asarray(full)).max()
    assert rel < 0.5, rel  # grouped int4 noise; ranking should mostly survive
    agree = (np.asarray(full.argmax(-1)) == np.asarray(q4.argmax(-1))).mean()
    assert agree > 0.6, agree


def test_int4_ignores_int8_compute_flag():
    """int4 leaves must always take the dequantizing W4A16 path — the W8A8
    int8-MXU route (and its activation quantization) is int8-only."""
    cfg, params = big_decoder()
    qp = quantize_tree(params, bits=4)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 8)))
    base = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    prev = llama.enable_int8_compute(True)
    try:
        under_flag = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    finally:
        llama.enable_int8_compute(prev)
    np.testing.assert_allclose(np.asarray(base), np.asarray(under_flag), rtol=0, atol=0)


def test_int4_moe_expert_stacks():
    """Grouped int4 quantization of the 4-D [L,E,in,out] expert stacks:
    scales [L,E,in/G,out]; the MoE dense route dequantizes per layer."""
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2,
        num_experts=4, num_experts_per_tok=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_tree(params, bits=4)
    leaf = qp["layers"]["gate_proj"]
    assert leaf["q4"].dtype == jnp.int8
    assert leaf["s"].shape == (2, 4, 2, 256)  # [L,E,256/128,out]
    dense_copy = dequantize_tree(qp, jnp.float32)
    ids = jnp.asarray(np.random.default_rng(6).integers(1, 512, (2, 12)), jnp.int32)
    a = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    b = llama.forward(dense_copy, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_int4_lora_merge_saves_dense():
    cfg, params = big_decoder()
    qp = quantize_tree(params, bits=4)
    from multimodal_unlearning_tpu.models import lora
    from multimodal_unlearning_tpu.utils.quantize import is_qtensor

    adapters = lora.init_lora(qp["layers"], 4, jax.random.PRNGKey(2))
    merged = lora.merge(qp, adapters, lora.lora_scale(4, 32))
    assert not any(is_qtensor(x) for x in jax.tree.leaves(merged, is_leaf=is_qtensor))
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_proj"], np.float32),
        np.asarray(dequantize_leaf(qp["layers"]["q_proj"], jnp.float32)),
        rtol=0, atol=1e-6,
    )
