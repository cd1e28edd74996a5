"""Paged KV cache attention: decode reads through a per-row block table.

The dense serving cache reserves ``B × Smax`` columns (one fixed slab per
decode slot — serve/engine.py).  A *paged* cache instead keeps one shared
pool of fixed-size pages

    k/v   [L, Hkv, NP_pool, page, D]      (+ int8 scales [L, Hkv, NP_pool, 1, page])
    table [B, MP] int32                   (page ids; MP = Smax // page)

and each slot's logical column ``c`` lives at pool page ``table[b, c//page]``,
offset ``c % page``.  HBM then holds the *sum of actual request lengths*
instead of ``slots × max_len``, shared prompt prefixes are one set of pages
referenced by every slot's table (zero-copy — the dense engine must copy the
prefix slab per slot), and admission control is a page-pool free list.
This is the TPU-native equivalent of vLLM's PagedAttention; the reference
has no serving layer at all (its eval decodes via HF ``model.generate``,
mm/eval.py:126-133).

Two implementations:

- **XLA** (CPU fallback / TP-sharded path): gather the row's pages into a
  contiguous [B, H, MP·page, D] view and run the masked reference attention.
  Correct everywhere; streams ``MP·page`` columns per row regardless of how
  long the row actually is.
- **Pallas** (TPU): grid ``(B, MP)`` with the layer id, block table and
  per-row page counts scalar-prefetched — the index map points each grid
  step's DMA straight at pool page ``table[b, j]``, fetching ALL KV heads
  of that page in one strided DMA (``[1, Hkv, 1, P, D]`` block: Hkv
  contiguous 32 KB segments ≈ 1 MB per step at 7B shapes), with per-head
  online-softmax accumulators across a row's pages.  Pages past the row's
  valid extent are *skipped* (the index map clamps to the previous page —
  no new DMA — and ``pl.when`` skips the compute), so short rows in a mixed
  batch cost only their own length: the paged kernel does strictly less
  memory traffic than the dense flash-decode kernel, which always streams
  the full [Smax, D] panel per row (ops/decode_attention.py).

  The grid deliberately does NOT iterate heads: an earlier
  ``(B, Hkv, MP)`` formulation issued one 32 KB DMA per (head, page) —
  2048 grid steps/layer at the 7B serve shape — and the per-step fixed
  cost (DMA issue, prologue, output writeback) made the kernel 5.4× the
  dense one (557.7 vs 103.0 ms/dispatch, measured in
  examples/serve_bench/paged_attrib.json).  Folding the head dim into
  the block amortizes that overhead 32×.

int8 pools carry per-position scales exactly like the dense int8 cache;
the scales factor out of both dot products, so the math is bit-identical
to dequantize-then-attend (see ops/decode_attention.py header).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_NEG_INF = -1e30


def is_paged(cache) -> bool:
    return isinstance(cache, dict) and "table" in cache


def gather_layer_kv(cache, layer, dtype):
    """Assemble layer ``layer``'s K/V contiguously through the block table.

    Returns (k, v) as [B, H, MP·page, D] in ``dtype`` (int8 pools are
    dequantized exactly).  This is the XLA fallback's view — logical column
    order, so the caller's [B, Smax] validity mask applies directly.
    """
    table = cache["table"]  # [B, MP]
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    k_l, v_l = idx(cache["k"]), idx(cache["v"])  # [H, NP, P, D]
    kg = jnp.take(k_l, table, axis=1)  # [H, B, MP, P, D]
    vg = jnp.take(v_l, table, axis=1)
    H, B, MP, P, D = kg.shape
    k = kg.transpose(1, 0, 2, 3, 4).reshape(B, H, MP * P, D)
    v = vg.transpose(1, 0, 2, 3, 4).reshape(B, H, MP * P, D)
    if cache["k"].dtype == jnp.int8:
        # scales [H, NP, 1, P] -> [B, H, MP·P] per-position, exact rescale
        ks = jnp.take(idx(cache["k_s"]), table, axis=1)  # [H, B, MP, 1, P]
        vs = jnp.take(idx(cache["v_s"]), table, axis=1)
        ks = ks.transpose(1, 0, 2, 3, 4).reshape(B, H, MP * P)
        vs = vs.transpose(1, 0, 2, 3, 4).reshape(B, H, MP * P)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    return k.astype(dtype), v.astype(dtype)


def _page_counts(kv_valid, page: int):
    """[B] number of leading pages covering every valid column of each row."""
    B, S = kv_valid.shape
    MP = S // page
    vpage = (kv_valid.reshape(B, MP, page) > 0).any(axis=2)  # [B, MP]
    last = jnp.max(
        jnp.where(vpage, jnp.arange(MP, dtype=jnp.int32)[None, :] + 1, 0), axis=1
    )
    return last.astype(jnp.int32)


def _paged_kernel(l_ref, t_ref, n_ref, q_ref, k_ref, v_ref, valid_ref, o_ref,
                  m_ref, d_ref, acc_ref, *, Hkv):
    del l_ref, t_ref  # consumed by the index maps
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    n = n_ref[b]

    @pl.when(j < n)
    def _page():
        valid = valid_ref[0, 0, 0] > 0  # [page]
        # unrolled per-head 2D dots (Mosaic-safe; the [Gp, P] softmax state
        # lives per head in the 3D scratch)
        for h in range(Hkv):
            q = q_ref[0, h]  # [Gp, D], pre-scaled by sm_scale
            k = k_ref[0, h, 0]  # [page, D]
            v = v_ref[0, h, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Gp, page]
            s = jnp.where(valid[None, :], s, _NEG_INF)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            # explicit zero on invalid columns: an all-invalid page (the
            # alignment gap after a page-aligned shared prefix) must
            # contribute nothing, but exp(-inf - -inf) would be 1 there
            p = jnp.where(valid[None, :], jnp.exp(s - m_new), 0.0)
            d_ref[h] = d_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = m_new
            o_ref[0, h] = (acc_ref[h] / jnp.maximum(d_ref[h], 1e-30)).astype(
                o_ref.dtype)


def _paged_kernel_q8(l_ref, t_ref, n_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                     valid_ref, o_ref, m_ref, d_ref, acc_ref, *, Hkv):
    del l_ref, t_ref
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    n = n_ref[b]

    @pl.when(j < n)
    def _page():
        valid = valid_ref[0, 0, 0] > 0
        for h in range(Hkv):
            q = q_ref[0, h]  # [Gp, D] bf16
            # int8 -> bf16 is exact; per-position scales applied OUTSIDE
            # the dots, also exactly (ops/decode_attention.py:_kernel_q8)
            k = k_ref[0, h, 0].astype(q.dtype)  # [page, D]
            v = v_ref[0, h, 0].astype(q.dtype)
            k_s = ks_ref[0, h, 0, 0]  # [page] f32
            v_s = vs_ref[0, h, 0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * k_s[None, :]
            s = jnp.where(valid[None, :], s, _NEG_INF)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid[None, :], jnp.exp(s - m_new), 0.0)
            d_ref[h] = d_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = (p * v_s[None, :]).astype(v.dtype)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                pv, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = m_new
            o_ref[0, h] = (acc_ref[h] / jnp.maximum(d_ref[h], 1e-30)).astype(
                o_ref.dtype)


def _pallas_paged(layer, table, npages, qs, k_pool, v_pool, k_s, v_s,
                  valid_p, *, interpret):
    """The pallas_call on (possibly per-shard-local) arrays.

    qs [B, Hkv, Gp, D] pre-scaled grouped queries; pools [L, Hkv, NP, P, D];
    scales [L, Hkv, NP, 1, P] or None; valid_p [B, MP, 1, P] int32;
    table [B, MP] / npages [B] int32 (scalar-prefetched with the layer id).
    Returns [B, Hkv, Gp, D].

    Grid (B, MP): one step per (row, page) covering ALL KV heads — the
    [1, Hkv, 1, P, D] block is one strided DMA of Hkv contiguous [P, D]
    segments (see module docstring for why the head dim must not be a grid
    axis).
    """
    from functools import partial as _partial

    B, Hkv, Gp, D = qs.shape
    _, _, _, P, _ = k_pool.shape
    MP = table.shape[1]
    quantized = k_s is not None

    def page_of(b, j, n_ref, t_ref):
        # clamp skipped steps to the row's last real page: the block index
        # repeats, so Mosaic issues no new DMA for them
        jc = jnp.minimum(j, jnp.maximum(n_ref[b] - 1, 0))
        return t_ref[b, jc]

    kv_map = lambda b, j, l, t, n: (l[0], 0, page_of(b, j, n, t), 0, 0)
    # validity rides as [B, MP, 1, P] so the block's last-two dims (1, P)
    # equal the array's — Mosaic requires (8, 128)-divisible or full-dim
    # blocks on the minor two axes (a (1, P) block over [B, MP, P] is not)
    vmask_map = lambda b, j, l, t, n: (
        b, jnp.minimum(j, jnp.maximum(n[b] - 1, 0)), 0, 0)

    kv_spec = pl.BlockSpec((1, Hkv, 1, P, D), kv_map)
    in_specs = [
        pl.BlockSpec((1, Hkv, Gp, D), lambda b, j, l, t, n: (b, 0, 0, 0)),
        kv_spec, kv_spec,
    ]
    operands = [qs, k_pool, v_pool]
    kernel = _partial(_paged_kernel, Hkv=Hkv)
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, 1, 1, P), kv_map)] * 2
        operands += [k_s, v_s]
        kernel = _partial(_paged_kernel_q8, Hkv=Hkv)
    in_specs.append(pl.BlockSpec((1, 1, 1, P), vmask_map))
    operands.append(valid_p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, MP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, Gp, D), lambda b, j, l, t, n: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, Gp, 1), jnp.float32),  # running max
            pltpu.VMEM((Hkv, Gp, 1), jnp.float32),  # running denom
            pltpu.VMEM((Hkv, Gp, D), jnp.float32),  # running numerator
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), qs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layer, table, npages, *operands)


def paged_decode_attention(
    q, cache, layer, kv_valid,
    *, sm_scale: float | None = None, impl: str = "auto", interpret: bool = False,
    mesh=None, head_axis: str = "tensor",
):
    """One-token attention against layer ``layer`` of a PAGED KV cache.

    Args:
      q: [B, Hq, 1, D] query (RoPE already applied).
      cache: {"k","v","table"[,"k_s","v_s"]} — pools [L, Hkv, NP, page, D],
        block table [B, MP] int32 (current token already written through it).
      layer: scalar int.
      kv_valid: [B, MP·page] LOGICAL validity mask (1 = attend).
      mesh/head_axis: tensor-parallel serving — pools shard on the head dim,
        the table/validity replicate; the kernel runs per-shard under
        ``shard_map`` exactly like the dense flash-decode kernel.
    Returns [B, Hq, 1, D] in q's dtype.
    """
    k_pool = cache["k"]
    quantized = k_pool.dtype == jnp.int8
    B, Hq, S1, D = q.shape
    _, Hkv, _, P, _ = k_pool.shape
    assert S1 == 1, "paged_decode_attention is single-token"
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5
    tp = mesh.shape.get(head_axis, 1) if mesh is not None else 1
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        # Mosaic lane alignment: the page is the minor-most block dim of the
        # validity/scale blocks, so it must be a lane multiple
        if impl == "pallas" and (P % 128 != 0 or D % 128 != 0):
            impl = "xla"
        if impl == "pallas" and tp > 1 and Hkv % tp != 0:
            impl = "xla"

    if impl == "xla":
        from multimodal_unlearning_tpu.ops.attention import mha_reference

        k, v = gather_layer_kv(cache, layer, q.dtype)
        return mha_reference(q, k, v, kv_valid, causal=False, sm_scale=sm_scale)

    # [B, Hq, D] -> [B, Hkv, Gp, D]: GQA group into the sublane dimension
    Gp = -(-G // 8) * 8
    qs = (q[:, :, 0, :].astype(jnp.float32) * sm_scale).astype(q.dtype)
    qs = qs.reshape(B, Hkv, G, D)
    if Gp != G:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    table = cache["table"].astype(jnp.int32)
    MP = table.shape[1]
    npages = jnp.maximum(_page_counts(kv_valid, P), 1)
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    valid_p = kv_valid.astype(jnp.int32).reshape(B, MP, 1, P)
    k_s = cache.get("k_s") if quantized else None
    v_s = cache.get("v_s") if quantized else None

    interp = interpret or impl == "interpret"
    args = [layer, table, npages, qs, cache["k"], cache["v"]] + (
        [k_s, v_s] if quantized else []) + [valid_p]

    def run(layer, table, npages, qs, k_pool, v_pool, *rest):
        if quantized:
            ks, vs, valid = rest
        else:
            (valid,) = rest
            ks = vs = None
        return _pallas_paged(layer, table, npages, qs, k_pool, v_pool,
                             ks, vs, valid, interpret=interp)

    if tp > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as Pp

        h = Pp(None, head_axis, None, None)            # qs / out
        c = Pp(None, head_axis, None, None, None)      # pools + scales
        specs = [Pp(None), Pp(), Pp(), h, c, c] + ([c, c] if quantized else []) + [Pp()]
        run = shard_map(
            run, mesh=mesh, in_specs=tuple(specs), out_specs=h, check_vma=False,
        )
    out = run(*args)
    return out[:, :, :G].reshape(B, Hq, 1, D)


def _paged_chunk_kernel(l_ref, t_ref, n_ref, off_ref, q_ref, k_ref, v_ref,
                        valid_ref, o_ref, m_ref, d_ref, acc_ref, *, C, P, Hkv):
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    n = n_ref[b]

    @pl.when(j < n)
    def _page():
        Mp = q_ref.shape[2]
        # head-independent masks: logical column of page j + in-chunk causal
        col = j * P + jax.lax.broadcasted_iota(jnp.int32, (Mp, P), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (Mp, P), 0) % C
        off = off_ref[b]
        in_chunk = (col >= off) & (col <= off + c)
        mask = (valid_ref[0, 0, 0][None, :] > 0) | in_chunk
        for h in range(Hkv):
            q = q_ref[0, h]  # [Mp, D]; row m = g*C + c
            k = k_ref[0, h, 0]  # [P, D]
            v = v_ref[0, h, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Mp, P]
            s = jnp.where(mask, s, _NEG_INF)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            d_ref[h] = d_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = m_new
            o_ref[0, h] = (acc_ref[h] / jnp.maximum(d_ref[h], 1e-30)).astype(
                o_ref.dtype)


def _paged_chunk_kernel_q8(l_ref, t_ref, n_ref, off_ref, q_ref, k_ref, v_ref,
                           ks_ref, vs_ref, valid_ref, o_ref,
                           m_ref, d_ref, acc_ref, *, C, P, Hkv):
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    n = n_ref[b]

    @pl.when(j < n)
    def _page():
        Mp = q_ref.shape[2]
        col = j * P + jax.lax.broadcasted_iota(jnp.int32, (Mp, P), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (Mp, P), 0) % C
        off = off_ref[b]
        in_chunk = (col >= off) & (col <= off + c)
        mask = (valid_ref[0, 0, 0][None, :] > 0) | in_chunk
        for h in range(Hkv):
            q = q_ref[0, h]
            k = k_ref[0, h, 0].astype(q.dtype)
            v = v_ref[0, h, 0].astype(q.dtype)
            k_s = ks_ref[0, h, 0, 0]
            v_s = vs_ref[0, h, 0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * k_s[None, :]
            s = jnp.where(mask, s, _NEG_INF)
            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            d_ref[h] = d_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = (p * v_s[None, :]).astype(v.dtype)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                pv, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = m_new
            o_ref[0, h] = (acc_ref[h] / jnp.maximum(d_ref[h], 1e-30)).astype(
                o_ref.dtype)


def paged_chunk_decode_attention(
    q, cache, layer, kv_valid, offset,
    *, sm_scale: float | None = None, interpret: bool = False,
):
    """Block-table-aware verify-chunk attention: C candidate tokens per row
    attend the PAGED pool directly (online softmax across the row's pages,
    per-row in-chunk causal term computed from LOGICAL columns j·page+i),
    removing the dense per-layer gather view the XLA path materializes
    (chunk_decode_attention's paged caveat).  Pages past both the valid
    prefix AND the chunk columns are skipped.

    Args as chunk_decode_attention; cache as paged_decode_attention.
    """
    from functools import partial as _partial

    k_pool = cache["k"]
    quantized = k_pool.dtype == jnp.int8
    B, Hq, C, D = q.shape
    _, Hkv, _, P, _ = k_pool.shape
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = D ** -0.5
    M = G * C
    Mp = -(-M // 8) * 8
    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    qs = qs.reshape(B, Hkv, G, C, D).reshape(B, Hkv, M, D)
    if Mp != M:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, Mp - M), (0, 0)))
    table = cache["table"].astype(jnp.int32)
    MP = table.shape[1]
    offset = jnp.asarray(offset, jnp.int32).reshape((-1,))
    # pages covering the accepted prefix AND the in-flight chunk columns
    npages = jnp.maximum(
        jnp.maximum(_page_counts(kv_valid, P), (offset + C - 1) // P + 1), 1)
    layer = jnp.asarray(layer, jnp.int32).reshape((1,))
    valid_p = kv_valid.astype(jnp.int32).reshape(B, MP, 1, P)

    def page_of(b, j, n_ref, t_ref):
        jc = jnp.minimum(j, jnp.maximum(n_ref[b] - 1, 0))
        return t_ref[b, jc]

    # grid (B, MP), all-heads blocks — same rationale as _pallas_paged
    kv_map = lambda b, j, l, t, n, off: (l[0], 0, page_of(b, j, n, t), 0, 0)
    # [B, MP, 1, P] validity: see _pallas_paged (Mosaic minor-dims rule)
    vmask_map = lambda b, j, l, t, n, off: (
        b, jnp.minimum(j, jnp.maximum(n[b] - 1, 0)), 0, 0)
    kv_spec = pl.BlockSpec((1, Hkv, 1, P, D), kv_map)
    in_specs = [
        pl.BlockSpec((1, Hkv, Mp, D), lambda b, j, l, t, n, off: (b, 0, 0, 0)),
        kv_spec, kv_spec,
    ]
    operands = [qs, k_pool, cache["v"]]
    kernel = _partial(_paged_chunk_kernel, C=C, P=P, Hkv=Hkv)
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, 1, 1, P), kv_map)] * 2
        operands += [cache["k_s"], cache["v_s"]]
        kernel = _partial(_paged_chunk_kernel_q8, C=C, P=P, Hkv=Hkv)
    in_specs.append(pl.BlockSpec((1, 1, 1, P), vmask_map))
    operands.append(valid_p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, MP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hkv, Mp, D), lambda b, j, l, t, n, off: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, Mp, 1), jnp.float32),
            pltpu.VMEM((Hkv, Mp, 1), jnp.float32),
            pltpu.VMEM((Hkv, Mp, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Mp, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layer, table, npages, offset, *operands)
    return out[:, :, :M].reshape(B, Hkv, G, C, D).reshape(B, Hq, C, D)
