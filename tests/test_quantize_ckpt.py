"""Quantized checkpoints: the offline quantize-once/serve-many deployment
path (cli/quantize_model.py + train/checkpoints.py quantized IO).

Beyond-reference — the reference always loads dense bf16 and shards with
DeepSpeed when it doesn't fit (mm/forget.py:79-115).  Here the quantizer
writes a native int8/int4 artifact (int4 nibble-packed for safetensors) and
every CLI auto-detects + loads it without materializing dense weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config.loader import load_config
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.train.checkpoints import (
    load_quantized_checkpoint,
    quantized_checkpoint_exists,
    save_quantized_checkpoint,
)
from multimodal_unlearning_tpu.utils.quantize import is_qtensor, quantize_tree


def _decoder(num_layers=2):
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=num_layers, num_heads=4, num_kv_heads=2,
    )
    return cfg, llama.init_params(cfg, jax.random.PRNGKey(0))


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(fa) == len(fb)
    for path, va in fa:
        vb = fb[path]
        assert va.dtype == vb.dtype, path
        np.testing.assert_array_equal(
            np.asarray(va.astype(jnp.float32)), np.asarray(vb.astype(jnp.float32)),
            err_msg=str(path),
        )


def test_int8_checkpoint_roundtrip_bit_exact(tmp_path):
    cfg, params = _decoder()
    qp = quantize_tree(params, bits=8)
    save_quantized_checkpoint(tmp_path, qp, meta={"bits": "int8"})
    assert quantized_checkpoint_exists(tmp_path)
    loaded, meta = load_quantized_checkpoint(tmp_path)
    assert meta["bits"] == "int8"
    _tree_equal(qp, loaded)


def test_int4_checkpoint_roundtrip_bit_exact(tmp_path):
    """q4 leaves (int8 nibble pairs) save and load verbatim."""
    cfg, params = _decoder()
    qp = quantize_tree(params, bits=4)
    save_quantized_checkpoint(tmp_path, qp, meta={"bits": "int4"})
    loaded, meta = load_quantized_checkpoint(tmp_path)
    assert loaded["layers"]["q_proj"]["q4"].dtype == jnp.int8
    _tree_equal(qp, loaded)
    # forward from the loaded tree == forward from the in-memory tree
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8)))
    a = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    b = llama.forward(loaded, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_float_leaf_dtype_cast_on_load(tmp_path):
    _, params = _decoder()
    qp = quantize_tree(params, bits=8)
    save_quantized_checkpoint(tmp_path, qp)
    loaded, _ = load_quantized_checkpoint(tmp_path, dtype=jnp.bfloat16)
    assert loaded["norm"].dtype == jnp.bfloat16          # plain float leaf cast
    assert loaded["layers"]["q_proj"]["q"].dtype == jnp.int8
    assert loaded["layers"]["q_proj"]["s"].dtype == jnp.float32  # scales stay f32


def test_quantize_base_params_is_idempotent_on_quantized_tree():
    from multimodal_unlearning_tpu.cli.common import quantize_base_params

    _, params = _decoder()
    qp = quantize_tree(params, bits=4)
    out = quantize_base_params(qp, "llama", "int8")  # wrong spec on purpose
    # pre-quantized tree passes through untouched — not re-quantized
    assert out is qp


def test_quantize_cli_then_eval_loads_it(tmp_path):
    """End-to-end deployment path: dense ckpt -> cli.quantize_model ->
    mm_eval with model_path=<quantized dir> (auto-detected, quantize_base
    NOT set) produces the same teacher-forced losses as quantizing in-RAM."""
    from multimodal_unlearning_tpu.cli import common, mm_eval, quantize_model
    from multimodal_unlearning_tpu.config.registry import get_model_identifiers

    # a dense "trained" checkpoint to quantize
    model_cfg = get_model_identifiers("small-llava-test")
    kind, mcfg, params = common.init_or_load_params(model_cfg, None, seed=7, dtype=jnp.float32)
    dense_dir = tmp_path / "dense"
    common.save_model(dense_dir, model_cfg, params)

    qcfg = load_config(config_dir(), "quantize")
    for k, v in dict(
        model_family="small-llava-test", model_path=str(dense_dir),
        save_dir=str(tmp_path / "int4"), bits="int4", dtype="float32",
    ).items():
        dict.__setitem__(qcfg, k, v)
    out = quantize_model.run(qcfg)
    assert out["quant_bytes"] < out["dense_bytes"]
    assert quantized_checkpoint_exists(tmp_path / "int4")

    def eval_cfg(model_path, **extra):
        cfg = load_config(config_dir() / "mm", "eval")
        for k, v in dict(
            model_family="small-llava-test", model_path=model_path,
            processor_path=None, save_dir=str(tmp_path / "out"),
            ds_size=4, batch_size=4, max_length=192, dtype="float32",
            eval_task_ids=[2], **extra,
        ).items():
            dict.__setitem__(cfg, k, v)
        dict.__setitem__(cfg, "data_path", ["synthetic"] * 6)
        dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
        return cfg

    from_ckpt = mm_eval.run(eval_cfg(str(tmp_path / "int4")))["eval_log_forget.json"]
    in_ram = mm_eval.run(eval_cfg(str(dense_dir), quantize_base="int4"))["eval_log_forget.json"]
    a = np.array([from_ckpt["avg_gt_loss"][k] for k in sorted(from_ckpt["avg_gt_loss"])])
    b = np.array([in_ram["avg_gt_loss"][k] for k in sorted(in_ram["avg_gt_loss"])])
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_vlm_mixed_tree_roundtrip(tmp_path):
    """VLM trees are mixed (float vision tower + quantized language tower);
    the checkpoint preserves exactly that split."""
    from multimodal_unlearning_tpu.cli import common
    from multimodal_unlearning_tpu.config.registry import get_model_identifiers

    model_cfg = get_model_identifiers("small-llava-test")
    kind, mcfg, params = common.init_or_load_params(model_cfg, None, seed=3, dtype=jnp.float32)
    qp = common.quantize_base_params(params, kind, "int8")
    save_quantized_checkpoint(tmp_path, qp, meta={"bits": "int8"})
    loaded, _ = load_quantized_checkpoint(tmp_path, dtype=jnp.float32)
    assert not any(
        is_qtensor(x)
        for x in jax.tree.leaves(loaded["vision_tower"], is_leaf=is_qtensor)
    )
    assert any(
        is_qtensor(x)
        for x in jax.tree.leaves(loaded["language_model"], is_leaf=is_qtensor)
    )
    _tree_equal(qp, loaded)


def test_legacy_int4_checkpoint_converts_to_q4(tmp_path):
    """Checkpoints written by the old jnp.int4 format (flat uint8 nibbles +
    int4_shapes metadata) load as q4 leaves and forward identically."""
    import json

    from safetensors.numpy import save_file

    cfg, params = _decoder()
    qp = quantize_tree(params, bits=4)

    # write the LEGACY layout by hand: unpack q4 to int4 values, flat-pack
    flat, int4_shapes = {}, {}
    for path, v in jax.tree_util.tree_flatten_with_path(qp)[0]:
        key = "/".join(str(k.key) for k in path)
        if key.endswith("/q4"):
            from multimodal_unlearning_tpu.utils.quantize import unpack_int4

            vals = np.asarray(unpack_int4(v)).astype(np.uint8) & 0xF
            flat_vals = vals.reshape(-1)
            key = key[:-1]  # "/q4" -> "/q" (legacy leaf name)
            int4_shapes[key] = [*v.shape[:-2], v.shape[-2] * 2, v.shape[-1]]
            flat[key] = (flat_vals[0::2] | (flat_vals[1::2] << 4)).astype(np.uint8)
        else:
            flat[key] = np.ascontiguousarray(np.asarray(v))
    save_file(flat, str(tmp_path / "model.quant.safetensors"))
    with open(tmp_path / "quantize_meta.json", "w") as f:
        json.dump({"bits": "int4", "int4_shapes": int4_shapes}, f)

    loaded, _ = load_quantized_checkpoint(tmp_path)
    _tree_equal(qp, loaded)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 8)))
    a = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    b = llama.forward(loaded, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
