"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_unlearning_tpu.parallel import (
    MeshSpec,
    batch_sharding,
    fsdp_sharding,
    make_mesh,
    shard_pytree,
)


def test_mesh_wildcard_resolution():
    # resolve() returns sizes in AXES order (data, fsdp, seq, expert, tensor, pipe)
    assert MeshSpec(-1, 1, 1, 1).resolve(8) == (8, 1, 1, 1, 1, 1)
    assert MeshSpec(-1, 2, 1, 1).resolve(8) == (4, 2, 1, 1, 1, 1)
    assert MeshSpec(2, 2, 1, 2).resolve(8) == (2, 2, 1, 1, 2, 1)
    assert MeshSpec(-1, 1, 1, 1, pipe=4).resolve(8) == (2, 1, 1, 1, 1, 4)
    assert MeshSpec(-1, expert=2).resolve(8) == (4, 1, 1, 2, 1, 1)


def test_make_mesh_axes():
    mesh = make_mesh(MeshSpec(data=2, fsdp=4, tensor=1))
    assert mesh.shape == {
        "data": 2, "fsdp": 4, "seq": 1, "expert": 1, "tensor": 1, "pipe": 1,
    }


def test_fsdp_sharding_partitions_large_leaves():
    mesh = make_mesh(MeshSpec(data=1, fsdp=8, tensor=1))
    params = {
        "w": jnp.zeros((1024, 64)),   # big: sharded on dim 0
        "b": jnp.zeros((64,)),        # tiny: replicated
    }
    sh = fsdp_sharding(params, mesh)
    assert sh["w"].spec == P("fsdp", None)
    assert sh["b"].spec == P()
    placed = shard_pytree(params, sh)
    # each shard holds 1/8 of w
    shard_shapes = {s.data.shape for s in placed["w"].addressable_shards}
    assert shard_shapes == {(128, 64)}


def test_data_parallel_psum_grads():
    """DP grad averaging: jit over sharded batch must psum over ICI-analog."""
    mesh = make_mesh(MeshSpec(data=4, fsdp=2, tensor=1))
    w = jnp.ones((16, 16))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    x = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    wr = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(wr, xs)
    g_local = jax.grad(loss)(w, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), rtol=1e-5)
