"""Flash-attention kernel equivalence tests (Pallas interpret vs XLA reference).

The reference gets these guarantees from FlashAttention-2's own test suite;
here the Pallas kernels are validated against the XLA math directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.ops import flash_attention, mha_reference


def make_qkv(rng, B=2, Hq=4, Hkv=4, Sq=128, Sk=128, D=32, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, Hq, Sq, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, Hkv, Sk, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, Hkv, Sk, D)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference(rng, causal):
    q, k, v = make_qkv(rng)
    out_p = flash_attention(q, k, v, causal=causal, impl="interpret")
    out_r = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5, rtol=2e-5)


def test_forward_left_padding_mask(rng):
    q, k, v = make_qkv(rng, B=2, Sq=128, Sk=128)
    # left padding: first 37 kv positions invalid in row 0, 5 in row 1
    kv_mask = np.ones((2, 128), np.int32)
    kv_mask[0, :37] = 0
    kv_mask[1, :5] = 0
    kv_mask = jnp.asarray(kv_mask)
    out_p = flash_attention(q, k, v, kv_mask, causal=True, impl="interpret")
    out_r = mha_reference(q, k, v, kv_mask, causal=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5, rtol=2e-5)


def test_gqa_head_mapping(rng):
    q, k, v = make_qkv(rng, Hq=8, Hkv=2)
    out_p = flash_attention(q, k, v, causal=True, impl="interpret")
    out_r = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5, rtol=2e-5)


def test_decode_q_offset(rng):
    """Single-query decode step against full-sequence reference."""
    B, H, S, D = 2, 4, 128, 32
    q_full, k, v = make_qkv(rng, B=B, Hq=H, Hkv=H, Sq=S, Sk=S, D=D)
    pos = 100
    q_step = q_full[:, :, pos : pos + 1, :]
    out_step = flash_attention(q_step, k, v, causal=True, q_offset=pos, impl="interpret")
    out_full = mha_reference(q_full, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_step[:, :, 0]), np.asarray(out_full[:, :, pos]), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_reference(rng, causal):
    q, k, v = make_qkv(rng, B=1, Hq=2, Hkv=2, Sq=128, Sk=128, D=32)
    kv_mask = np.ones((1, 128), np.int32)
    kv_mask[0, :11] = 0
    kv_mask = jnp.asarray(kv_mask)

    def loss_p(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask, causal=causal, impl="interpret") ** 2)

    def loss_r(q, k, v):
        return jnp.sum(mha_reference(q, k, v, kv_mask, causal=causal) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )


def test_gradients_gqa(rng):
    q, k, v = make_qkv(rng, B=1, Hq=4, Hkv=2, Sq=64, Sk=64, D=32)

    def loss_p(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, impl="interpret") ** 2)

    def loss_r(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )


def test_fully_masked_rows_no_nan(rng):
    q, k, v = make_qkv(rng, B=1, Hq=2, Hkv=2, Sq=64, Sk=64)
    kv_mask = jnp.zeros((1, 64), jnp.int32)  # everything masked

    out = flash_attention(q, k, v, kv_mask, impl="interpret")
    assert not np.isnan(np.asarray(out)).any()

    g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, kv_mask, impl="interpret")))(q)
    assert not np.isnan(np.asarray(g)).any()


@pytest.mark.parametrize("group", [1, 2])
def test_decode_attention_matches_reference(rng, group):
    """Flash-decode kernel (scalar-prefetched layer index into the stacked
    cache) vs the XLA dynamic-slice + mha_reference fallback."""
    from multimodal_unlearning_tpu.ops.decode_attention import decode_attention

    L, B, Hkv, Smax, D = 3, 2, 2, 256, 32
    Hq = Hkv * group
    cache = {
        "k": jnp.asarray(rng.normal(size=(L, B, Hkv, Smax, D)), jnp.float32),
        "v": jnp.asarray(rng.normal(size=(L, B, Hkv, Smax, D)), jnp.float32),
    }
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    valid = np.zeros((B, Smax), np.int32)
    valid[0, 10:100] = 1
    valid[1, :77] = 1
    valid = jnp.asarray(valid)

    for layer in (0, 2):
        out_k = decode_attention(q, cache, layer, valid, impl="pallas", interpret=True)
        out_r = decode_attention(q, cache, layer, valid, impl="xla")
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_r), atol=2e-5, rtol=2e-5
        )


@pytest.mark.parametrize("quantized", [False, True], ids=["bf16-cache", "int8-cache"])
def test_decode_attention_tensor_parallel_shards(rng, quantized):
    """TP eval path: the kernel under shard_map over the head ('tensor') axis
    must reproduce the unsharded result — heads are embarrassingly parallel,
    so TP decode keeps the flash kernel instead of downgrading to XLA."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodal_unlearning_tpu.models import llama
    from multimodal_unlearning_tpu.ops.decode_attention import decode_attention

    L, B, Hkv, Smax, D, group = 2, 2, 4, 256, 32, 2
    Hq = Hkv * group
    k = jnp.asarray(rng.normal(size=(B, Hkv, Smax, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, Smax, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    valid = np.zeros((B, Smax), np.int32)
    valid[0, 5:90] = 1
    valid[1, :60] = 1
    valid = jnp.asarray(valid)

    if quantized:

        class _Cfg:
            num_layers, num_kv_heads, head_dim = L, Hkv, D

        cache = llama.init_kv_cache(_Cfg, B, Smax, dtype=jnp.int8)
        cache = llama._cache_write(cache, k, v, 1, 0)
    else:
        cache = {
            "k": jnp.stack([jnp.zeros_like(k), k]),
            "v": jnp.stack([jnp.zeros_like(v), v]),
        }

    ref = decode_attention(q, cache, 1, valid, impl="pallas", interpret=True)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("tensor",))
    q_sh = jax.device_put(q, NamedSharding(mesh, P(None, "tensor", None, None)))
    cache_sh = {
        kk: jax.device_put(
            vv,
            NamedSharding(mesh, P(None, None, "tensor", None, None)),
        )
        for kk, vv in cache.items()
    }
    out = decode_attention(
        q_sh, cache_sh, 1, valid, impl="interpret", mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_attention_int8_cache(rng):
    """int8-cache kernel: scale-factored math must match dequantize-then-
    attend exactly (XLA fallback), and track the unquantized result."""
    from multimodal_unlearning_tpu.models import llama
    from multimodal_unlearning_tpu.ops.decode_attention import decode_attention

    L, B, Hkv, Smax, D = 2, 2, 2, 256, 32
    k = jnp.asarray(rng.normal(size=(B, Hkv, Smax, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, Smax, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    valid = np.zeros((B, Smax), np.int32)
    valid[:, :100] = 1
    valid = jnp.asarray(valid)

    class _Cfg:
        num_layers, num_kv_heads, head_dim = L, Hkv, D

    cache8 = llama.init_kv_cache(_Cfg, B, Smax, dtype=jnp.int8)
    cache8 = llama._cache_write(cache8, k, v, 1, 0)
    cachef = {"k": jnp.stack([jnp.zeros_like(k), k]), "v": jnp.stack([jnp.zeros_like(v), v])}

    out_k8 = decode_attention(q, cache8, 1, valid, impl="pallas", interpret=True)
    out_r8 = decode_attention(q, cache8, 1, valid, impl="xla")
    out_f = decode_attention(q, cachef, 1, valid, impl="xla")
    np.testing.assert_allclose(np.asarray(out_k8), np.asarray(out_r8), atol=3e-5, rtol=3e-5)
    # int8 quantization noise vs the full-precision result
    np.testing.assert_allclose(np.asarray(out_k8), np.asarray(out_f), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("G", [1, 4])
def test_chunk_decode_pallas_matches_xla(int8, G):
    """Flash verify-chunk kernel (interpret mode) == the XLA chunk path:
    per-row offsets, in-chunk causal term, GQA grouping, int8 scales."""
    from multimodal_unlearning_tpu.models.llama import _cache_write_per_row
    from multimodal_unlearning_tpu.ops.decode_attention import (
        chunk_decode_attention,
    )

    rng = np.random.default_rng(0)
    L, B, Hkv, Smax, D, C = 2, 3, 2, 256, 128, 5
    Hq = Hkv * G
    dtype = jnp.float32
    cache = {
        "k": jnp.zeros((L, B, Hkv, Smax, D), jnp.int8 if int8 else dtype),
        "v": jnp.zeros((L, B, Hkv, Smax, D), jnp.int8 if int8 else dtype),
    }
    if int8:
        cache["k_s"] = jnp.zeros((L, B, Hkv, 1, Smax), jnp.float32)
        cache["v_s"] = jnp.zeros((L, B, Hkv, 1, Smax), jnp.float32)
    # per-row prefixes then the C-token chunk, written like the verify step
    offset = jnp.asarray([7, 40, 101], jnp.int32)
    for layer in range(L):
        pre_k = jnp.asarray(rng.normal(size=(B, Hkv, 120, D)), dtype)
        pre_v = jnp.asarray(rng.normal(size=(B, Hkv, 120, D)), dtype)
        cache = _cache_write_per_row(cache, pre_k, pre_v, layer,
                                     jnp.zeros((B,), jnp.int32))
        ck = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), dtype)
        cv = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), dtype)
        cache = _cache_write_per_row(cache, ck, cv, layer, offset)
    valid = np.zeros((B, Smax), np.int32)
    for b in range(B):
        valid[b, : int(offset[b])] = 1
    valid = jnp.asarray(valid)
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), dtype)
    want = chunk_decode_attention(q, cache, 1, valid, offset, impl="xla")
    got = chunk_decode_attention(q, cache, 1, valid, offset, impl="pallas",
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
