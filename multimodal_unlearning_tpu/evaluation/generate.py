"""Greedy batched generation with a sharded KV cache.

Replaces HF ``model.generate(..., use_cache=True)`` (reference:
mm/eval.py:126-133, nlp/evaluate_util.py:172-185):

- prefill + the whole decode loop run as ONE jitted XLA program: the
  [L,B,Hkv,Smax,D] KV cache is created, written by the flash-attention
  prefill, scanned through ``max_new_tokens`` decode steps, and dropped —
  entirely inside the program.  It never crosses a program boundary, so XLA
  keeps a single buffer in its preferred layout (passing a host-created
  cache as a donated argument measurably relayout-copies it: +4 GB peak and
  an OOM for an int8 7B at batch 8 on a 16 GB v5e);
- the program returns ONLY the emitted token ids; finished rows (eos) keep
  emitting pad;
- everything is static-shape: Smax = prompt bucket + max_new_tokens.

Compilation is cached on the (hashable, frozen) model config + static
shapes, so per-batch calls from the eval loop reuse the executable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.models import decoder_module, vlm_module


def pad_prompts(encoded: list[list[int]], pad_id: int, multiple: int = 128):
    """Left-pad variable-length prompts into a lane-aligned [B, S] batch."""
    import numpy as np

    S = -(-max(len(e) for e in encoded) // multiple) * multiple
    ids = np.full((len(encoded), S), pad_id, np.int32)
    mask = np.zeros((len(encoded), S), np.int32)
    for r, e in enumerate(encoded):
        e = e[-S:]
        ids[r, S - len(e):] = e
        mask[r, S - len(e):] = 1
    return ids, mask


def _fwd_fn(model_cfg, is_vlm, attn_impl, compute_dtype, params, mesh=None):
    if is_vlm:
        return partial(
            vlm_module(model_cfg).forward, params, model_cfg,
            attn_impl=attn_impl, compute_dtype=compute_dtype, mesh=mesh,
        )
    return partial(
        decoder_module(model_cfg).forward, params, model_cfg,
        attn_impl=attn_impl, compute_dtype=compute_dtype, mesh=mesh,
    )


@partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "is_vlm", "attn_impl", "compute_dtype", "cache_dtype",
        "smax", "max_new_tokens", "pad_token_id", "eos", "int8_compute", "mesh",
        "do_sample", "temperature", "top_k", "top_p",
    ),
)
def _generate(params, input_ids, attention_mask, pixel_values,
              *, model_cfg, is_vlm, attn_impl, compute_dtype, cache_dtype,
              smax, max_new_tokens, pad_token_id, eos, int8_compute, mesh=None,
              do_sample: bool = False, sample_seeds=None,
              temperature=1.0, top_k: int = 0, top_p=1.0):
    # int8_compute is read as a module global at trace time (models.llama
    # INT8_COMPUTE); it is in the signature ONLY to key the jit cache so
    # toggling the flag retraces instead of reusing a stale executable
    del int8_compute
    dec_cfg = model_cfg.decoder if is_vlm else model_cfg
    dec = decoder_module(dec_cfg)
    B, S = input_ids.shape

    cache = dec.init_kv_cache(dec_cfg, B, smax, dtype=cache_dtype)
    kv_valid = jnp.zeros((B, smax), jnp.int32).at[:, :S].set(attention_mask)
    prompt_len = jnp.sum(attention_mask, axis=-1)  # valid tokens per row
    fwd = _fwd_fn(model_cfg, is_vlm, attn_impl, compute_dtype, params, mesh=mesh)

    # prefill: one flash-attention pass over the left-padded prompt
    kw = dict(
        attention_mask=attention_mask,
        kv_cache=cache, cache_offset=0, kv_valid_mask=kv_valid,
    )
    if is_vlm:
        kw["pixel_values"] = pixel_values
    # last_logit_only: prefill never needs the full [B,S,V] head output
    # (1.9 GB at B8 S3712 V32k) — only the final position seeds decode
    out = fwd(input_ids, last_logit_only=True, **kw)
    cache = out["kv_cache"]
    # Qwen2-VL M-RoPE: decode positions continue from max prompt position
    rope_delta = out.get("rope_delta")
    if do_sample:
        # per-row fold-in keys: token i of seed s is a pure function of
        # (s, i) — identical through the serving engine (sampling.py)
        from multimodal_unlearning_tpu.evaluation.sampling import row_keys, sample_token

        keys = row_keys(sample_seeds)
        pick = lambda logits, idx: sample_token(
            keys, idx, logits, temperature, top_k, top_p)
        first_token = pick(
            out["logits"][:, -1, :], jnp.zeros((B,), jnp.int32)).astype(input_ids.dtype)
    else:
        first_token = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(input_ids.dtype)

    finished0 = (first_token == eos) if eos >= 0 else jnp.zeros((B,), bool)
    first_emit = jnp.where(finished0, pad_token_id, first_token)
    if max_new_tokens == 1:
        return first_emit[:, None]

    def step(carry, t):
        cache, kv_valid, token, finished = carry
        kv_valid = kv_valid.at[:, S + t].set((~finished).astype(jnp.int32))
        pos = (prompt_len + t)[:, None]
        dec_kw = dict(
            attention_mask=jnp.ones((B, 1), jnp.int32),
            positions=pos,
            kv_cache=cache, cache_offset=S + t, kv_valid_mask=kv_valid,
        )
        if is_vlm:
            dec_kw["pixel_values"] = None
        if rope_delta is not None:
            dec_kw["rope_delta"] = rope_delta
        out = fwd(token[:, None], **dec_kw)
        if do_sample:
            nxt = pick(
                out["logits"][:, -1, :],
                jnp.full((B,), t + 1, jnp.int32)).astype(token.dtype)
        else:
            nxt = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(token.dtype)
        newly_finished = finished | (nxt == eos)
        emit = jnp.where(newly_finished, pad_token_id, nxt)
        return (out["kv_cache"], kv_valid, nxt, newly_finished), emit

    if eos < 0:
        # fixed token budget: a plain scan (known trip count pipelines best)
        (_, _, _, _), emitted = jax.lax.scan(
            step, (cache, kv_valid, first_token, finished0),
            jnp.arange(max_new_tokens - 1),
        )
        return jnp.concatenate([first_emit[:, None], emitted.T], axis=1)

    # eos set: early-exit while_loop — real answers finish long before the
    # max_new_tokens budget (eval default 300), and the reference-style
    # fixed-length decode burns the remainder on every already-drained batch.
    # Emitted tokens are IDENTICAL to the scan (finished rows emit pad; the
    # loop just stops once every row is finished).
    out_buf = jnp.full((B, max_new_tokens), pad_token_id, jnp.int32)
    out_buf = out_buf.at[:, 0].set(first_emit.astype(jnp.int32))

    def w_cond(st):
        return jnp.any(~st[0][3]) & (st[1] < max_new_tokens - 1)

    def w_body(st):
        carry, t, buf = st
        carry, emit = step(carry, t)
        return carry, t + 1, buf.at[:, t + 1].set(emit.astype(jnp.int32))

    _, _, out_buf = jax.lax.while_loop(
        w_cond, w_body,
        ((cache, kv_valid, first_token, finished0), jnp.int32(0), out_buf))
    return out_buf.astype(input_ids.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "is_vlm", "attn_impl", "compute_dtype", "cache_dtype",
        "smax", "max_new_tokens", "pad_token_id", "eos", "int8_compute",
        "k_spec", "return_stats", "mesh",
    ),
)
def _spec_generate(params, input_ids, attention_mask, pixel_values, draft_ref,
                   *, model_cfg, is_vlm, attn_impl, compute_dtype, cache_dtype,
                   smax, max_new_tokens, pad_token_id, eos, int8_compute,
                   k_spec, return_stats=False, mesh=None):
    """Prompt-lookup speculative greedy decode — TOKEN-IDENTICAL to
    ``_generate`` by construction, in fewer (but heavier) forwards.

    Each iteration drafts ``k_spec`` continuation tokens by matching the
    current 2-gram against the row's own history (prompt + accepted
    output — greedy eval generations echo names/captions and repeat
    themselves, so lookups hit), then verifies the whole chunk with ONE
    ``chunk_decode`` forward: a draft token is accepted only when it equals
    the model's own argmax, and the model's argmax after the last accepted
    token rides along free — 1..k_spec+1 tokens per forward.  Rows accept
    independently (per-row cache columns via models/llama.py's per-row
    cache write); rejected speculative cache entries are simply left
    invalid and overwritten by later rounds.

    No draft model, no resampling, no approximation: pure greedy
    verification (HF's ``prompt_lookup_num_tokens`` is the same contract).
    """
    del int8_compute
    dec_cfg = model_cfg.decoder if is_vlm else model_cfg
    dec = decoder_module(dec_cfg)
    B, S = input_ids.shape
    K = k_spec
    vocab = dec_cfg.vocab_size

    cache = dec.init_kv_cache(dec_cfg, B, smax, dtype=cache_dtype)
    kv_valid = jnp.zeros((B, smax), jnp.int32).at[:, :S].set(attention_mask)
    prompt_len = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    fwd = _fwd_fn(model_cfg, is_vlm, attn_impl, compute_dtype, params, mesh=mesh)

    kw = dict(
        attention_mask=attention_mask,
        kv_cache=cache, cache_offset=0, kv_valid_mask=kv_valid,
    )
    if is_vlm:
        kw["pixel_values"] = pixel_values
    out = fwd(input_ids, last_logit_only=True, **kw)
    cache = out["kv_cache"]
    rope_delta = out.get("rope_delta")
    first = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(jnp.int32)

    finished0 = (first == eos) if eos >= 0 else jnp.zeros((B,), bool)
    finished0 = finished0 | (max_new_tokens <= 1)
    # token history for the n-gram lookup: -2 marks never-match slots
    ids_buf = jnp.full((B, smax), -2, jnp.int32)
    ids_buf = ids_buf.at[:, :S].set(
        jnp.where(attention_mask > 0, input_ids.astype(jnp.int32), -2))
    out_buf = jnp.full((B, max_new_tokens + K + 1), pad_token_id, jnp.int32)
    out_buf = out_buf.at[:, 0].set(jnp.where(finished0, pad_token_id, first))

    ar = jnp.arange(K + 1, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    # reference corpus for the lookup (e.g. the eval sample's ground-truth
    # answer): matched like history but fully known ahead of time, so a
    # generation that TRACKS the reference accepts K drafts every round
    # wherever it re-anchors — exactness is untouched (drafts only propose).
    # A -5 separator stops 2-grams from straddling corpus and history.
    R = draft_ref.shape[1]
    sep = jnp.full((B, 1), -5, jnp.int32)
    W = R + 1 + smax
    col2 = jnp.arange(W, dtype=jnp.int32)

    def propose(ids_buf, token, cur):
        """Most recent 2-gram match in [reference corpus | history] -> the K
        tokens that followed it.

        Matches at the history edge have little known continuation (a pure
        token run always matches at cur-3 with just one known follower), so
        prefer the most recent match whose FULL K-token continuation is
        known and fall back to the most recent with at least one.  History
        columns sit after the corpus, so plain most-recent also prefers the
        actual context over a corpus re-anchor when both match."""
        buf = jnp.concatenate([draft_ref, sep, ids_buf], axis=1)  # [B, W]
        prev = ids_buf[rows, jnp.maximum(cur - 1, 0)]
        nxt = jnp.concatenate([buf[:, 1:], jnp.full((B, 1), -3, jnp.int32)], axis=1)
        m = (buf == prev[:, None]) & (nxt == token[:, None])
        pcol = col2[None, :]
        # known-continuation limit per match position: corpus matches may
        # draft up to the corpus end, history matches up to cur
        limit = jnp.where(pcol < R, R, R + 1 + cur[:, None])
        p_full = jnp.max(jnp.where(m & (pcol + 2 + K <= limit), pcol, -1), axis=1)
        p_any = jnp.max(jnp.where(m & (pcol + 2 < limit), pcol, -1), axis=1)
        p = jnp.where(p_full >= 0, p_full, p_any)  # [B]
        cols = p[:, None] + 2 + ar[None, :K]
        vals = buf[rows[:, None], jnp.clip(cols, 0, W - 1)]
        p_limit = jnp.where(p < R, R, R + 1 + cur)
        known = (p[:, None] >= 0) & (cols < p_limit[:, None])
        return jnp.where(known, vals, -4)  # -4: never equals a real argmax

    def cond(st):
        return jnp.any(~st["finished"])

    def body(st):
        live = ~st["finished"]
        cur, pos, token = st["cur"], st["pos"], st["token"]
        draft = propose(st["ids_buf"], token, cur)          # [B, K]
        chunk = jnp.concatenate([token[:, None], draft], axis=1)  # [B, K+1]
        chunk_in = jnp.clip(chunk, 0, vocab - 1)

        dec_kw = dict(
            attention_mask=jnp.ones((B, K + 1), jnp.int32),
            positions=pos[:, None] + ar[None, :],
            kv_cache=st["cache"], cache_offset=cur,
            kv_valid_mask=st["kv_valid"], chunk_decode=True,
        )
        if is_vlm:
            dec_kw["pixel_values"] = None
        if rope_delta is not None:
            dec_kw["rope_delta"] = rope_delta
        o = fwd(chunk_in, **dec_kw)
        preds = jnp.argmax(o["logits"], axis=-1).astype(jnp.int32)  # [B, K+1]

        # a = matched draft prefix length; emitted candidates preds[:, :a+1]
        matches = jnp.cumprod(
            (draft == preds[:, :K]).astype(jnp.int32), axis=1)
        a = jnp.sum(matches, axis=1)                         # [B] in 0..K
        n_emit = a + 1
        if eos >= 0:
            is_eos = preds == eos
            eos_idx = jnp.min(
                jnp.where(is_eos, ar[None, :], K + 1), axis=1)
            n_emit = jnp.minimum(n_emit, eos_idx)            # eos emits pad
            hit_eos = eos_idx <= a
        else:
            hit_eos = jnp.zeros((B,), bool)
        rem = max_new_tokens - st["n_out"]
        n_emit = jnp.minimum(n_emit, rem)
        n_emit = jnp.where(live, n_emit, 0)

        emit_mask = ar[None, :] < n_emit[:, None]            # [B, K+1]
        out_cols = jnp.where(
            emit_mask, st["n_out"][:, None] + ar[None, :], max_new_tokens + ar[None, :])
        out_buf = st["out_buf"].at[rows[:, None], out_cols].set(
            jnp.where(emit_mask, preds, pad_token_id))

        # accepted context tokens chunk[0..a] extend history and validity
        acc_mask = (ar[None, :] <= a[:, None]) & live[:, None]
        ids_cols = jnp.where(acc_mask, cur[:, None] + ar[None, :], smax - 1)
        ids_vals = jnp.where(
            acc_mask, chunk, st["ids_buf"][rows[:, None], ids_cols])
        ids_buf = st["ids_buf"].at[rows[:, None], ids_cols].set(ids_vals)
        kv_valid = st["kv_valid"].at[rows[:, None], ids_cols].max(
            acc_mask.astype(jnp.int32))

        adv = jnp.where(live, a + 1, 0)
        n_out = st["n_out"] + n_emit
        finished = st["finished"] | hit_eos | (n_out >= max_new_tokens)
        token = jnp.where(live, preds[rows, a], st["token"])
        return {
            "cache": o["kv_cache"], "kv_valid": kv_valid, "ids_buf": ids_buf,
            "out_buf": out_buf, "cur": cur + adv, "pos": pos + adv,
            "n_out": n_out, "token": token, "finished": finished,
            "rounds": st["rounds"] + 1,
        }

    st = jax.lax.while_loop(cond, body, {
        "cache": cache, "kv_valid": kv_valid, "ids_buf": ids_buf,
        "out_buf": out_buf, "cur": jnp.full((B,), S, jnp.int32),
        "pos": prompt_len, "n_out": jnp.ones((B,), jnp.int32),
        "token": first, "finished": finished0,
        "rounds": jnp.zeros((), jnp.int32),
    })
    tokens = st["out_buf"][:, :max_new_tokens]
    if return_stats:
        # verify rounds (≡ decode forwards) and per-row emitted counts:
        # tokens-per-forward = n_out.sum() / rounds vs 1.0 for plain greedy
        return tokens, st["rounds"], st["n_out"]
    return tokens


# AOT decode executables with AUTO parameter layouts, keyed by
# (params identity, static config): the executable picks its preferred
# weight layouts and the params are device_put into them ONCE — without
# this, XLA relayout-copies the int8 weight tree inside every decode
# program invocation (~1.5 GB of s8 copies + fragmentation at 7B, measured
# round 2; the copies are also pure HBM-bandwidth waste per call).
_AOT_DECODE_CACHE: dict = {}

# id(params) of weight trees already device_put into some executable's
# preferred formats.  A second AOT variant over the same tree (e.g. the
# int8-KV-cache decode after the bf16-cache one) must NOT lower with AUTO
# again: lowering AUTO against arrays holding non-default layouts raises,
# and relayouting to the new executable's preference would invalidate the
# first executable's cached weight tree.  Instead those compiles pin
# in_shardings to the weights' CURRENT formats — decode is weight-stream
# bound, so sharing one layout across variants costs nothing and the tree
# is never duplicated.
_AOT_RELAYOUTED: set = set()


def _relayout_in_place(params, p_formats):
    """device_put each weight into its executable-preferred format ONE LEAF
    AT A TIME, deleting the original buffer before moving to the next, and
    splicing the new array into the caller's (nested-dict) tree.

    Peak extra HBM = one leaf, not the whole tree: a bulk
    ``tree.map(device_put)`` transiently double-buffers every relayouted
    weight while the originals are still referenced — ~7 GB of int8 at
    LLaVA-7B, which OOMs a 16 GB v5e (observed round 3).  Mutating in place
    also means the relayouted tree IS the caller's tree afterwards, so the
    AOT cache holds no duplicate copy of the model."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    fmts = jax.tree_util.tree_leaves(
        p_formats, is_leaf=lambda x: not isinstance(x, dict))
    moved = {}  # id(original) → relayouted array, for aliased leaves
    for (path, leaf), fmt in zip(leaves, fmts):
        new = moved.get(id(leaf))
        if new is None:
            new = jax.device_put(leaf, fmt)
            if new is not leaf:
                jax.block_until_ready(new)
                moved[id(leaf)] = new
                leaf.delete()
        if new is leaf:
            continue
        node = params
        for k in path[:-1]:
            node = node[k.key]
        node[path[-1].key] = new
    return params


def _aot_generate(params, input_ids, attention_mask, pixel_values, static_kw):
    from jax.experimental.layout import Format, Layout

    key = (id(params), input_ids.shape, None if pixel_values is None else pixel_values.shape,
           tuple(sorted(static_kw.items(), key=lambda kv: kv[0])))
    hit = _AOT_DECODE_CACHE.get(key)
    if hit is None:
        def fn(p, ids, mask, pix):
            return _generate(p, ids, mask, pix, **static_kw)

        if id(params) in _AOT_RELAYOUTED:
            fmts = jax.tree.map(lambda x: x.format, params)
            jitted = jax.jit(fn, in_shardings=(fmts, None, None, None))
            compiled = jitted.lower(params, input_ids, attention_mask, pixel_values).compile()
            params_f = params
        else:
            auto = jax.tree.map(lambda _: Format(Layout.AUTO), params)
            jitted = jax.jit(fn, in_shardings=(auto, None, None, None))
            compiled = jitted.lower(params, input_ids, attention_mask, pixel_values).compile()
            p_formats = compiled.input_formats[0][0]
            params_f = _relayout_in_place(params, p_formats)
            _AOT_RELAYOUTED.add(id(params))
        _AOT_DECODE_CACHE[key] = (compiled, params_f)
        hit = _AOT_DECODE_CACHE[key]
    compiled, params_f = hit
    return compiled(params_f, input_ids, attention_mask, pixel_values)


def greedy_generate(
    params,
    model_cfg,
    input_ids,
    attention_mask,
    *,
    max_new_tokens: int,
    pad_token_id: int,
    eos_token_id: int | None = None,
    pixel_values=None,
    is_vlm: bool = False,
    cache_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    mesh=None,
    aot_layouts: bool = False,
    speculate_k: int = 0,
    draft_ref=None,
    do_sample: bool = False,
    temperature=1.0,
    top_k: int = 0,
    top_p=1.0,
    sample_seeds=None,
):
    """Returns generated token ids [B, max_new_tokens] (pad after eos).

    ``mesh``: tensor-parallel eval — the flash-decode kernel runs per-shard
    over the mesh's head ('tensor') axis instead of downgrading to XLA.
    ``aot_layouts``: compile with AUTO parameter layouts and device_put the
    weights into the executable's preferred formats once (see
    _AOT_DECODE_CACHE).
    ``speculate_k``: >0 enables prompt-lookup speculative decoding — K
    drafted tokens verified per forward, token-identical output
    (_spec_generate; all decoder families).
    ``draft_ref``: optional [B, R] reference token rows (-2 padded) seeding
    the lookup corpus — e.g. the eval sample's ground-truth answer; output
    is still exactly greedy, but generations that track the reference
    accept K drafts per forward.
    ``do_sample``: stochastic decoding (temperature / top_k / top_p —
    evaluation/sampling.py, beyond-reference).  ``sample_seeds`` [B] give
    each row its stream seed (default arange(B)); token i of seed s is a
    pure function of (s, i), so streams reproduce through the serving
    engine."""
    B, S = input_ids.shape
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    from multimodal_unlearning_tpu.models.llama import INT8_COMPUTE

    slack = 2 * speculate_k + 2 if speculate_k else 0
    Smax = -(-(S + max_new_tokens + slack) // 128) * 128  # lane-aligned cache
    static_kw = dict(
        model_cfg=model_cfg, is_vlm=is_vlm,
        attn_impl=attn_impl, compute_dtype=compute_dtype,
        cache_dtype=cache_dtype, smax=Smax, max_new_tokens=max_new_tokens,
        pad_token_id=pad_token_id,
        eos=-1 if eos_token_id is None else eos_token_id,
        int8_compute=INT8_COMPUTE,
        mesh=mesh,
    )
    if do_sample:
        # stochastic decoding (sampling.py): exact greedy contracts
        # (speculative verify, AOT layout cache keys) don't apply
        if speculate_k:
            raise ValueError("speculate_k verifies against greedy argmax; "
                             "combine it with do_sample=False")
        if sample_seeds is None:
            sample_seeds = jnp.arange(B, dtype=jnp.int32)
        return _generate(
            params, input_ids, attention_mask, pixel_values,
            do_sample=True, sample_seeds=jnp.asarray(sample_seeds, jnp.int32),
            temperature=float(temperature), top_k=top_k,
            top_p=float(top_p), **static_kw)
    if speculate_k:
        if draft_ref is None:
            draft_ref = jnp.zeros((B, 0), jnp.int32)
        return _spec_generate(
            params, input_ids, attention_mask, pixel_values,
            jnp.asarray(draft_ref, jnp.int32), k_spec=speculate_k, **static_kw)
    if aot_layouts:
        return _aot_generate(params, input_ids, attention_mask, pixel_values, static_kw)
    return _generate(params, input_ids, attention_mask, pixel_values, **static_kw)
