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
