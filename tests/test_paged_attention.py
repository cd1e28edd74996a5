"""Paged KV cache attention (ops/paged_attention.py): pool + block-table
reads must agree exactly with the dense [L,B,H,Smax,D] cache paths —
single-token decode (XLA and the Pallas online-softmax kernel in interpret
mode), speculative verify chunks, int8 pools, per-row paged writes, and
all-invalid "gap" pages (the page-aligned shared-prefix layout).

Beyond-reference: the reference serves via HF batch ``generate``
(mm/eval.py:126-133) with one dense cache per batch; paging is the
vLLM-style production memory layout, built TPU-first (scalar-prefetched
block-table DMA instead of CUDA gather kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.ops.decode_attention import (
    chunk_decode_attention,
    decode_attention,
)
from multimodal_unlearning_tpu.ops.paged_attention import (
    _page_counts,
    gather_layer_kv,
    paged_decode_attention,
)


def _dense_cache(rng, L, B, H, S, D, dtype, int8=False):
    cache = {
        "k": jnp.asarray(rng.normal(size=(L, B, H, S, D)), dtype),
        "v": jnp.asarray(rng.normal(size=(L, B, H, S, D)), dtype),
    }
    if int8:
        # quantize exactly like _cache_write so dense == paged bitwise
        out = {}
        for key in ("k", "v"):
            x = np.asarray(cache[key], np.float32)
            s = np.abs(x).max(axis=-1, keepdims=True) / 127.0
            q = np.round(x / np.maximum(s, 1e-12)).astype(np.int8)
            out[key] = jnp.asarray(q)
            out[key + "_s"] = jnp.asarray(
                s[..., 0][:, :, :, None, :], jnp.float32)  # [L,B,H,1,S]
        cache = out
    return cache


def _to_paged(dense, page, rng):
    """Chop a dense [L,B,H,S,D] cache into a pool with a RANDOM page
    assignment (page 0 reserved as the trash page)."""
    k = np.asarray(dense["k"])
    L, B, H, S, D = k.shape
    MP = S // page
    NP = B * MP + 1
    ids = 1 + rng.permutation(NP - 1)[: B * MP]
    table = ids.reshape(B, MP).astype(np.int32)
    pool = {
        "k": np.zeros((L, H, NP, page, D), k.dtype),
        "v": np.zeros((L, H, NP, page, D), k.dtype),
    }
    int8 = "k_s" in dense
    if int8:
        pool["k_s"] = np.zeros((L, H, NP, 1, page), np.float32)
        pool["v_s"] = np.zeros((L, H, NP, 1, page), np.float32)
    for b in range(B):
        for j in range(MP):
            pid = table[b, j]
            sl = slice(j * page, (j + 1) * page)
            for key in ("k", "v"):
                pool[key][:, :, pid] = np.asarray(dense[key])[:, b, :, sl, :]
                if int8:
                    pool[key + "_s"][:, :, pid, 0, :] = np.asarray(
                        dense[key + "_s"])[:, b, :, 0, sl]
    out = {key: jnp.asarray(v) for key, v in pool.items()}
    out["table"] = jnp.asarray(table)
    return out


@pytest.mark.parametrize("int8", [False, True])
def test_paged_xla_matches_dense(int8):
    rng = np.random.default_rng(0)
    L, B, Hkv, G, S, D, page = 3, 4, 2, 3, 96, 32, 16
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32, int8=int8)
    paged = _to_paged(dense, page, rng)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, 1, D)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, (B, S)), jnp.int32)
    valid = valid.at[:, 0].set(1)  # at least one valid column per row
    for layer in (0, L - 1):
        want = decode_attention(q, dense, layer, valid, impl="xla")
        got = decode_attention(q, paged, layer, valid, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
def test_paged_pallas_interpret_matches_xla(int8):
    """The online-softmax page kernel (interpret mode) == the gather path,
    at lane-aligned shapes (page % 128 == 0, D == 128)."""
    rng = np.random.default_rng(1)
    L, B, Hkv, G, S, D, page = 2, 3, 2, 4, 512, 128, 128
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32, int8=int8)
    paged = _to_paged(dense, page, rng)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, 1, D)), jnp.float32)
    # ragged lengths per row; rows 0/1/2 use 1/2/4 pages
    valid = np.zeros((B, S), np.int32)
    for b, n in enumerate((70, 200, 512)):
        valid[b, :n] = 1
    valid = jnp.asarray(valid)
    want = paged_decode_attention(q, paged, 1, valid, impl="xla")
    got = paged_decode_attention(q, paged, 1, valid, impl="pallas",
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_pallas_gap_pages():
    """An all-invalid page mid-row (the alignment gap after a page-aligned
    shared prefix) must contribute nothing — exercises the explicit p=0
    masking in the online accumulator."""
    rng = np.random.default_rng(2)
    L, B, Hkv, G, S, D, page = 2, 2, 1, 8, 512, 128, 128
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32)
    paged = _to_paged(dense, page, rng)
    valid = np.zeros((B, S), np.int32)
    valid[:, :100] = 1          # prefix (partial page 0)
    valid[:, 256:400] = 1       # suffix after a fully-invalid page 1
    valid = jnp.asarray(valid)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, 1, D)), jnp.float32)
    want = decode_attention(q, dense, 0, valid, impl="xla")
    got = paged_decode_attention(q, paged, 0, valid, impl="pallas",
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_page_counts():
    valid = jnp.asarray(np.array([
        [1, 1, 0, 0, 0, 0, 0, 0],   # 1 page
        [0, 0, 0, 1, 0, 0, 1, 0],   # 4 pages (last valid col 6)
        [0, 0, 0, 0, 0, 0, 0, 0],   # 0 pages
    ], np.int32))
    np.testing.assert_array_equal(
        np.asarray(_page_counts(valid, 2)), [1, 4, 0])


@pytest.mark.parametrize("int8", [False, True])
def test_chunk_decode_paged_matches_dense(int8):
    """Speculative verify chunks read the paged pool through the same
    gather view: per-row offsets + in-chunk causal masking unchanged."""
    rng = np.random.default_rng(3)
    L, B, Hkv, G, S, D, page, C = 2, 3, 2, 2, 64, 32, 16, 4
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32, int8=int8)
    paged = _to_paged(dense, page, rng)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, C, D)), jnp.float32)
    offset = jnp.asarray([5, 17, 40], jnp.int32)
    valid = np.zeros((B, S), np.int32)
    for b in range(B):
        valid[b, : int(offset[b])] = 1
    valid = jnp.asarray(valid)
    want = chunk_decode_attention(q, dense, 1, valid, offset)
    got = chunk_decode_attention(q, paged, 1, valid, offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("C", [1, 3])
def test_cache_write_paged(int8, C):
    """Per-row writes through the block table land exactly where the dense
    per-row scatter lands (checked through the contiguous gather view)."""
    rng = np.random.default_rng(4)
    L, B, Hkv, S, D, page = 2, 3, 2, 64, 16, 16
    dtype = jnp.float32
    dense = _dense_cache(rng, L, B, Hkv, S, D, dtype, int8=int8)
    paged = _to_paged(dense, page, rng)
    k_new = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), dtype)
    v_new = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), dtype)
    offset = jnp.asarray([3, 15, 60 - C], jnp.int32)
    dense2 = llama._cache_write_per_row(dense, k_new, v_new, 1, offset)
    paged2 = llama._cache_write_per_row(paged, k_new, v_new, 1, offset)
    for layer in range(L):
        kd, vd = gather_layer_kv(paged2, layer, jnp.float32)
        # dense -> same logical view
        if int8:
            from multimodal_unlearning_tpu.ops.decode_attention import _dequant

            idx = lambda a: np.asarray(a)[layer]
            kref = _dequant(jnp.asarray(idx(dense2["k"])),
                            jnp.asarray(idx(dense2["k_s"])))
            vref = _dequant(jnp.asarray(idx(dense2["v"])),
                            jnp.asarray(idx(dense2["v_s"])))
        else:
            kref, vref = dense2["k"][layer], dense2["v"][layer]
        np.testing.assert_allclose(np.asarray(kd), np.asarray(kref, np.float32),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vref, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_paged_write_then_attend():
    """End-to-end mini decode step: write a new token per row through the
    table, then attend — paged == dense, including the freshly written
    column."""
    rng = np.random.default_rng(5)
    L, B, Hkv, G, S, D, page = 2, 2, 2, 2, 32, 16, 8
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32)
    paged = _to_paged(dense, page, rng)
    k_new = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    offset = jnp.asarray([7, 20], jnp.int32)
    valid = np.zeros((B, S), np.int32)
    for b in range(B):
        valid[b, : int(offset[b]) + 1] = 1
    valid = jnp.asarray(valid)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, 1, D)), jnp.float32)
    dense2 = llama._cache_write_per_row(dense, k_new, v_new, 1, offset)
    paged2 = llama._cache_write_per_row(paged, k_new, v_new, 1, offset)
    want = decode_attention(q, dense2, 1, valid, impl="xla")
    got = decode_attention(q, paged2, 1, valid, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
def test_paged_chunk_kernel_matches_gather_path(int8):
    """Block-table-aware verify-chunk kernel (interpret) == the XLA gather
    path: online softmax across pages + logical-column in-chunk causal."""
    rng = np.random.default_rng(6)
    L, B, Hkv, G, S, D, page, C = 2, 3, 2, 2, 256, 128, 128, 5
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32, int8=int8)
    paged = _to_paged(dense, page, rng)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, C, D)), jnp.float32)
    offset = jnp.asarray([5, 120, 200], jnp.int32)  # rows span 1..2 pages
    valid = np.zeros((B, S), np.int32)
    for b in range(B):
        valid[b, : int(offset[b])] = 1
    valid = jnp.asarray(valid)
    want = chunk_decode_attention(q, paged, 1, valid, offset, impl="xla")
    got = chunk_decode_attention(q, paged, 1, valid, offset, impl="pallas",
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_chunk_kernel_covers_chunk_beyond_valid_pages():
    """A chunk landing on a page with NO accepted-prefix validity (fresh
    decode page) must still be read — npages covers the chunk columns."""
    rng = np.random.default_rng(7)
    L, B, Hkv, G, S, D, page, C = 1, 2, 1, 8, 512, 128, 128, 4
    dense = _dense_cache(rng, L, B, Hkv, S, D, jnp.float32)
    paged = _to_paged(dense, page, rng)
    q = jnp.asarray(rng.normal(size=(B, Hkv * G, C, D)), jnp.float32)
    offset = jnp.asarray([128, 256], jnp.int32)  # chunk starts a NEW page
    valid = np.zeros((B, S), np.int32)
    valid[0, :128] = 1
    valid[1, :256] = 1
    valid = jnp.asarray(valid)
    want = chunk_decode_attention(q, paged, 0, valid, offset, impl="xla")
    got = chunk_decode_attention(q, paged, 0, valid, offset, impl="pallas",
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
