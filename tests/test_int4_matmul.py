"""W4A16 Pallas kernel (ops/int4_matmul.py) vs the XLA dequant reference.

The kernel rearranges the grouped-dequant matmul so scales hit the f32 dot
partials instead of materialized weights — mathematically identical, so
parity with utils.quantize.int4_matmul (and with the f64 dense-dequant
oracle) is the whole contract.  Interpret mode on CPU; the on-chip Mosaic
gate lives in examples/kernel_onchip_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.ops.int4_matmul import (
    _blocks,
    int4_matmul_pallas,
    supported,
)
from multimodal_unlearning_tpu.utils.quantize import (
    dequantize_leaf,
    int4_matmul,
    quantize_leaf_int4,
)


def _case(m, k, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, k)), dtype)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.05)
    qt = quantize_leaf_int4(w)
    return x, qt


@pytest.mark.parametrize("m", [1, 8, 40])
@pytest.mark.parametrize("k,n", [(512, 384), (768, 512), (2048, 256)])
def test_kernel_matches_xla_path(m, k, n):
    x, qt = _case(m, k, n)
    assert supported(qt["q4"], qt["s"])
    ref = int4_matmul(x, qt["q4"], qt["s"])
    got = int4_matmul_pallas(x, qt["q4"], qt["s"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_matches_dense_dequant_oracle():
    x, qt = _case(8, 1024, 512, seed=3)
    dense = dequantize_leaf(qt, jnp.float32)
    oracle = np.asarray(x, np.float64) @ np.asarray(dense, np.float64)
    got = int4_matmul_pallas(x, qt["q4"], qt["s"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), oracle, rtol=1e-4, atol=1e-4)


def test_bf16_activation_dtype():
    x, qt = _case(8, 512, 256, seed=5, dtype=jnp.bfloat16)
    ref = int4_matmul(x, qt["q4"], qt["s"])
    got = int4_matmul_pallas(x, qt["q4"], qt["s"], interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_block_picker_covers_7b_shapes():
    # llama-7B leaves: attn [4096, 4096], FFN [4096, 11008] / [11008, 4096],
    # lm_head [4096, 32000] — K2/g = 43 (prime) must still tile
    for k, n in [(4096, 4096), (4096, 11008), (11008, 4096), (4096, 32000)]:
        gh = (k // 2) // 128
        assert _blocks(k // 2, gh, n) is not None, (k, n)


def test_odd_shapes_fall_back():
    # contracting dim whose half isn't 128-group-divisible -> XLA path only
    x, qt = _case(4, 360, 256, seed=7)
    assert not supported(qt["q4"], qt["s"])
    ref = int4_matmul(x, qt["q4"], qt["s"])  # must not raise (XLA fallback)
    assert ref.shape == (4, 256)


def test_dispatch_prefers_kernel_on_tpu_only(monkeypatch):
    from multimodal_unlearning_tpu.ops import int4_matmul as mod

    monkeypatch.setenv("MMU_INT4_PALLAS", "0")
    assert not mod.use_pallas_int4()
    monkeypatch.delenv("MMU_INT4_PALLAS")
    assert mod.use_pallas_int4() == (jax.default_backend() == "tpu")
