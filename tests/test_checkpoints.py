"""HF-bridge round-trips, checkpoint save/load, Orbax resume, TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import hf_bridge, llama, llava
from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh
from multimodal_unlearning_tpu.parallel.tp import tp_degree_ok, tp_shard_decoder
from multimodal_unlearning_tpu.train import checkpoints, optim, trainer


def tiny_llava():
    arch = get_model_identifiers("tiny-llava-test").arch
    cfg = llava.LlavaConfig.from_registry(arch)
    return cfg, llava.init_params(cfg, jax.random.PRNGKey(0))


def trees_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y), atol=1e-6)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_llava_hf_roundtrip():
    cfg, params = tiny_llava()
    sd = hf_bridge.llava_to_hf(params, cfg.vision.patch_size)
    # key surface matches HF llava naming
    assert "language_model.model.layers.0.self_attn.q_proj.weight" in sd
    assert "vision_tower.vision_model.encoder.layers.0.mlp.fc1.weight" in sd
    assert "multi_modal_projector.linear_1.weight" in sd
    # HF Linear layout is [out, in]
    assert sd["language_model.lm_head.weight"].shape == (
        cfg.decoder.vocab_size, cfg.decoder.hidden_size,
    )
    back = hf_bridge.llava_from_hf(sd, cfg.decoder.num_layers, cfg.vision.num_layers)
    assert trees_equal(params, back)


def test_hf_roundtrip_preserves_forward():
    cfg, params = tiny_llava()
    sd = hf_bridge.llava_to_hf(params, cfg.vision.patch_size)
    back = hf_bridge.llava_from_hf(sd, cfg.decoder.num_layers, cfg.vision.num_layers)
    back = jax.tree.map(jnp.asarray, back)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (1, 8)))
    a = llava.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    b = llava.forward(back, cfg, ids, compute_dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_safetensors_checkpoint_roundtrip(tmp_path):
    cfg, params = tiny_llava()
    sd = hf_bridge.llava_to_hf(params, cfg.vision.patch_size)
    checkpoints.save_hf_checkpoint(tmp_path, sd, config={"arch": "tiny"})
    assert checkpoints.model_checkpoint_exists(tmp_path)
    assert not checkpoints.model_checkpoint_exists(tmp_path / "nope")
    sd2 = checkpoints.load_hf_checkpoint(tmp_path)
    assert set(sd2.keys()) == set(sd.keys())
    assert trees_equal(list(sd.values()), [sd2[k] for k in sd.keys()])


def test_orbax_train_state_resume(tmp_path):
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tx = optim.make_optimizer("adamw", 1e-3)
    state = trainer.create_train_state(params, tx)
    raw = {"step": 7, "trainable": state.trainable, "opt_state": state.opt_state}
    checkpoints.save_train_state(tmp_path, 7, raw)
    assert checkpoints.latest_train_state_step(tmp_path) == 7
    restored = checkpoints.restore_train_state(tmp_path, 7, raw)
    assert int(np.asarray(restored["step"])) == 7
    assert trees_equal(restored["trainable"], state.trainable)


def test_tp_sharded_forward_matches_replicated():
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, tensor=2))
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    assert tp_degree_ok(cfg, 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)))

    ref = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    tp_params = tp_shard_decoder(params, mesh, fsdp_axis=True)
    out = jax.jit(
        lambda p, i: llama.forward(p, cfg, i, compute_dtype=jnp.float32)["logits"]
    )(tp_params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_async_checkpointer_roundtrip_and_prune(tmp_path):
    """TrainStateCheckpointer: async writes land identically to sync ones,
    keep_last prunes old steps (latest always survives), and resume reads
    the pruned directory correctly."""
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tx = optim.make_optimizer("adamw", 1e-3)
    state = trainer.create_train_state(params, tx)

    ck = checkpoints.TrainStateCheckpointer(tmp_path, async_save=True, keep_last=2)
    for step in (3, 6, 9):
        raw = {"step": step, "trainable": state.trainable,
               "opt_state": state.opt_state}
        ck.save(step, raw)
    ck.wait()
    # pruned to the newest 2
    assert checkpoints.latest_train_state_step(tmp_path) == 9
    kept = sorted(int(d.name.split("_")[1]) for d in tmp_path.glob("step_*"))
    assert kept == [6, 9]
    restored = checkpoints.restore_train_state(tmp_path, 9, raw)
    assert int(np.asarray(restored["step"])) == 9
    assert trees_equal(restored["trainable"], state.trainable)


def test_latest_step_ignores_interrupted_tmp_dirs(tmp_path):
    """A crash mid-save leaves an Orbax tmp dir; resume must skip it
    instead of crashing on int()."""
    (tmp_path / "step_4").mkdir()
    (tmp_path / "step_7.orbax-checkpoint-tmp-1730000000").mkdir()
    assert checkpoints.latest_train_state_step(tmp_path) == 4


def test_async_checkpoint_error_surfaces(tmp_path, monkeypatch):
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tx = optim.make_optimizer("adamw", 1e-3)
    state = trainer.create_train_state(params, tx)
    ck = checkpoints.TrainStateCheckpointer(tmp_path, async_save=True)

    def boom(self, step, host_state):
        self._error = RuntimeError("disk full")

    monkeypatch.setattr(checkpoints.TrainStateCheckpointer, "_write", boom)
    ck.save(1, {"step": 1, "trainable": state.trainable})
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="disk full"):
        ck.wait()
