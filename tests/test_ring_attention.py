"""Ring attention vs full causal attention on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.ops import mha_reference
from multimodal_unlearning_tpu.ops.ring_attention import ring_flash_attention
from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh


@pytest.fixture(scope="module")
def mesh():
    # sequence parallelism over the 'data' axis for the test
    return make_mesh(MeshSpec(data=4, fsdp=2, tensor=1))


def make_qkv(rng, B=2, H=4, S=256, D=32):
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    return q, k, v


def test_ring_matches_full_causal(mesh):
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng)
    want = mha_reference(q, k, v, causal=True)
    got = ring_flash_attention(q, k, v, mesh, axis="data", impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_pallas_interpret_matches(mesh):
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng, S=512)
    want = mha_reference(q, k, v, causal=True)
    got = ring_flash_attention(q, k, v, mesh, axis="data", impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)


def test_ring_gradients_match(mesh):
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, B=1, H=2, S=128, D=16)

    def loss_ring(q, k, v):
        return jnp.sum(ring_flash_attention(q, k, v, mesh, axis="data", impl="xla") ** 2)

    def loss_full(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=f"d{n}")


def test_ring_gradients_match_pallas_bwd(mesh):
    """Full pallas bwd ring (interpret mode) vs dense-causal autodiff."""
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, B=1, H=2, S=512, D=32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_flash_attention(q, k, v, mesh, axis="data", impl="interpret") ** 2)

    def loss_full(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=f"d{n}")


def test_ring_padding_and_gqa(mesh):
    """Left padding + grouped KV heads through the ring (fwd + grads)."""
    rng = np.random.default_rng(4)
    B, Hq, Hkv, S, D = 2, 4, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :64] = 0
    mask[1, :17] = 0
    maskj = jnp.asarray(mask)

    want = mha_reference(q, k, v, maskj, causal=True)
    got = ring_flash_attention(q, k, v, mesh, axis="data", kv_mask=maskj, impl="xla")
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[valid],
        np.asarray(want).transpose(0, 2, 1, 3)[valid],
        atol=5e-5, rtol=5e-5,
    )

    def loss_ring(q, k, v):
        o = ring_flash_attention(q, k, v, mesh, axis="data", kv_mask=maskj, impl="xla")
        return jnp.sum(jnp.where(maskj[:, None, :, None] > 0, o, 0.0) ** 2)

    def loss_full(q, k, v):
        o = mha_reference(q, k, v, maskj, causal=True)
        return jnp.sum(jnp.where(maskj[:, None, :, None] > 0, o, 0.0) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=f"d{n}")


def test_sequence_parallel_decoder_train_step():
    """Integration: the llama decoder trains with attn_impl='ring' over a
    {data:2, seq:4} mesh — gradients match the standard attention path."""
    from multimodal_unlearning_tpu.models import llama

    mesh = make_mesh(MeshSpec(data=2, fsdp=1, seq=4, tensor=1))
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, max_position_embeddings=512,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, S = 2, 512
    ids = jnp.asarray(rng.integers(3, 128, (B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, :100] = 0
    mask = jnp.asarray(mask)

    def loss(p, impl, mesh_):
        out = llama.forward(
            p, cfg, ids, attention_mask=mask, attn_impl=impl,
            compute_dtype=jnp.float32, mesh=mesh_,
        )
        lg = out["logits"] * mask[..., None]
        return jnp.mean(lg[:, :-1].astype(jnp.float32) ** 2)

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        l_ring, g_ring = jax.value_and_grad(lambda p: loss(p, "ring", mesh))(params)
    l_std, g_std = jax.value_and_grad(lambda p: loss(p, "xla", None))(params)
    np.testing.assert_allclose(float(l_ring), float(l_std), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4
        ),
        g_ring, g_std,
    )
