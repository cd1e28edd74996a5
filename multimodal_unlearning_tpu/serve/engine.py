"""Continuous-batching serving engine (beyond-reference).

The reference stack serves its unlearned checkpoints through HF
``model.generate`` one batch at a time (mm/eval.py:126-133): a batch
admits requests together and releases them together, so one long answer
stalls every finished row, and new requests wait for the whole batch to
drain.  Production serving wants *iteration-level* (continuous) batching:
a fixed pool of decode slots, each slot at its own sequence position,
with finished slots refilled from the queue between decode steps.

TPU-first design — everything static-shape, three compiled programs:

- ``prefill+insert`` (one per prompt-length bucket): runs the prompt
  through the model into a fresh [L,1,H,Sp,D] cache slab, then scatters
  the slab, validity row, and slot metadata into the engine state at a
  traced slot index.  Donated state -> in-place update, no cache copy.
- ``decode_chunk``: ``lax.scan`` over T single-token steps for ALL slots
  at once.  Every slot sits at a different column, so the KV write is a
  per-row scatter (models/llama.py:_cache_write_per_row) and positions /
  validity are per-row vectors — the flash-decode kernel already reads
  the cache through a [B,Smax] validity mask, so mixed-progress slots
  cost nothing extra.
- the state (cache + slot metadata) is created INSIDE ``init`` and only
  ever flows program->program: it never crosses to host, so XLA keeps one
  buffer in its preferred layout (evaluation/generate.py header explains
  why host-created caches relayout-copy).

The host loop (``ServingEngine.run``) is pure bookkeeping: fill free
slots, fire a chunk, scatter the emitted tokens to their requests, retire
finished slots.  Token emission order within a chunk is deterministic, so
an engine drain is reproducible.

Greedy decoding matches evaluation/generate.py:greedy_generate token for
token (tests/test_serve.py asserts exact agreement per request).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.models import decoder_module, vlm_module


@dataclass
class Request:
    """One generation request: prompt token ids -> generated token ids."""

    uid: int
    prompt_ids: list
    max_new_tokens: int
    pixel_values: np.ndarray | None = None
    draft_ref: list = field(default_factory=list)  # lookup-corpus seed tokens
    sample_seed: int = 0  # stream seed under sampled decoding
    prefix: int | None = None  # registered shared-prefix id (prefix cache)
    lora_id: int = 0  # adapter index under multi-LoRA serving (0 = base)
    tokens: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # per emitted token (opt-in)
    stop: list = field(default_factory=list)  # token-id stop sequences
    done: bool = False
    submit_t: float = 0.0   # time.monotonic at submit
    first_t: float = 0.0    # first token available (TTFT = first_t - submit_t)
    done_t: float = 0.0     # request completed


def _bucket(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


class ServingEngine:
    """Fixed-slot continuous-batching engine over one model.

    Args:
      params / model_cfg / kind: as returned by cli.common.init_or_load_params.
      num_slots: decode batch width B (static).
      max_len: per-slot cache length Smax (static; prompt + new tokens must
        fit — longer submissions are rejected).
      chunk: decode steps per dispatch (static; emission latency bound).
      bucket_multiple: prompt lengths round up to this, bounding the number
        of prefill executables.
      speculate_k: >0 turns every decode step into a prompt-lookup
        speculative VERIFY round (evaluation/generate.py:_spec_generate):
        K drafted tokens checked with one chunk_decode forward, 1..K+1
        tokens emitted per slot per step — output stays token-identical to
        plain greedy.  Slots accept independently (per-row cache columns).
      spec_ref_len: width of the per-slot draft-corpus buffer; requests may
        carry ``draft_ref`` tokens (e.g. a cached prior answer) that seed
        the lookup beyond the slot's own history.
      prefill_chunk: >0 enables chunked prefill — prompts longer than this
        prefill one chunk per engine step (first chunk through the
        standalone fill program, middle chunks extending the slab via
        chunk_decode passes, the final right-padded chunk through the
        suffix-insert program), so in-flight slots keep decoding between
        chunks instead of stalling behind one long prompt.  Output is
        token-identical to monolithic prefill.
      page_size: >0 switches the KV cache to a PAGED pool (vLLM-style,
        ops/paged_attention.py): one shared pool of fixed-size pages plus a
        host-managed per-slot block table, instead of a dense
        [slots × max_len] slab.  HBM then holds roughly the sum of actual
        request lengths, registered prefixes are shared pages referenced by
        every slot's table (zero-copy — the dense path copies the prefix
        slab per slot), and admission waits on the page free list instead
        of failing.  Output is token-identical to the dense cache.
        Caveat: with ``speculate_k`` the verify chunk reads the pool
        through a dense per-layer gather view (a transient, not persistent,
        allocation — see chunk_decode_attention's docstring).
      kv_pool_pages: pool size in pages (page 0 is a reserved trash page
        for retired slots).  Default ``slots × (max_len/page) + 1`` — the
        dense layout's capacity; set lower to cap KV memory and let
        admission control queue requests.
      logprobs: attach the model's log-probability of every emitted token
        to its request (``Request.logprobs``, aligned with ``tokens``).
        Raw ``log_softmax(logits)`` — temperature/top-k/top-p do NOT
        rescale it (the OpenAI-completions convention).  Opt-in: adds one
        [B, V] log-softmax per decode step.
    """

    def __init__(
        self,
        params,
        model_cfg,
        kind: str,
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        chunk: int = 16,
        bucket_multiple: int = 128,
        pad_token_id: int = 0,
        eos_token_id: int | None = None,
        cache_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        mesh=None,
        pipeline: bool = True,
        speculate_k: int = 0,
        spec_ref_len: int = 0,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        adapters: dict | None = None,
        prefill_chunk: int = 0,
        page_size: int = 0,
        kv_pool_pages: int | None = None,
        logprobs: bool = False,
    ):
        if attn_impl == "auto":
            attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.params = params
        self.model_cfg = model_cfg
        self.kind = kind
        self.is_vlm = kind in ("llava", "qwen2_vl") or hasattr(model_cfg, "decoder")
        self.dec_cfg = model_cfg.decoder if self.is_vlm else model_cfg
        self.B = num_slots
        self.smax = _bucket(max_len, 128)
        self.chunk = chunk
        self.bucket_multiple = bucket_multiple
        # paged KV cache: pool + host-managed block table; bucket/smax round
        # to page multiples so every slab boundary is page-aligned
        self.page = int(page_size)
        if self.page:
            if not (128 % self.page == 0 or self.page % 128 == 0):
                raise ValueError(
                    f"page_size {self.page} must divide or be a multiple of "
                    "128 (Mosaic lane alignment)")
            import math

            self.bucket_multiple = math.lcm(bucket_multiple, self.page)
            self.smax = _bucket(max_len, math.lcm(128, self.page))
            self.MP = self.smax // self.page
            self.NP = int(kv_pool_pages or self.B * self.MP + 1)
            # page 0 is the trash page: retired slots' tables point at it so
            # their in-scan garbage writes can never corrupt a live page
            self._free_pages = list(range(1, self.NP))
            self._table = np.zeros((self.B, self.MP), np.int32)
            self._table_dev = None
            self._slot_pages: list[list[int]] = [[] for _ in range(self.B)]
            self._peak_pages = 0
            # on-demand paging bookkeeping: per-slot {base, admit_toks,
            # n_prefix, max_own, seq} (None = slot idle); see
            # _ensure_page_coverage for the growth/preemption protocol
            self._pmeta: list[dict | None] = [None] * self.B
            self._admit_seq = 0
            self._n_preempt = 0
        self.pad_id = pad_token_id
        self.eos = -1 if eos_token_id is None else eos_token_id
        self.cache_dtype = cache_dtype
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        self.mesh = mesh
        self.K = int(speculate_k)
        self.R = int(spec_ref_len) if self.K else 0
        # stochastic decoding (evaluation/sampling.py): temperature > 0
        # samples; token i of a request seeded s depends only on (s, i), so
        # streams reproduce solo greedy_generate(do_sample=True) runs
        self.want_lp = bool(logprobs)
        self.do_sample = float(temperature) > 0.0
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        if self.do_sample and self.K:
            raise ValueError("speculate_k verifies against greedy argmax; "
                             "use temperature=0 with speculation")
        # multi-LoRA serving: {name: (adapter_tree, scale)} stacked into one
        # bank; each slot decodes through its own adapter in the same
        # forward (per-row gather — models/lora.py:stack_adapters).  Index 0
        # is the bare base model (a zero adapter).
        self._adapter_ids = {None: 0}
        self._lora = None
        if adapters:
            from multimodal_unlearning_tpu.models.lora import stack_adapters

            trees, scales = [], []
            for i, (name, (tree, scale)) in enumerate(adapters.items()):
                self._adapter_ids[name] = i + 1
                trees.append(tree)
                scales.append(float(scale))
            zero = jax.tree.map(jnp.zeros_like, trees[0])
            self._lora = stack_adapters([zero] + trees, [0.0] + scales)

        # chunked prefill: long prompts prefill prefill_chunk tokens per
        # engine step instead of monolithically, so in-flight slots keep
        # decoding between chunks (bounded head-of-line latency).  0 = off.
        self.prefill_chunk = (
            _bucket(int(prefill_chunk), self.bucket_multiple) if prefill_chunk else 0)
        self._prefill_job: dict | None = None
        self._n_prefill_chunks = 0

        self.pipeline = pipeline
        self._queue: list[Request] = []
        self._slot_req: list[Request | None] = [None] * self.B
        self._free = list(range(self.B))
        self._uid = 0
        self._state = None
        # host-side counters (stats()): dispatches, per-slot live rounds,
        # emitted tokens — spec acceptance = emitted / live_rounds
        self._n_dispatch = 0
        self._n_prefill = 0
        self._n_live_rounds = 0
        self._n_emitted = 0
        self._insert_cache: dict = {}
        self._prefix_fill_cache: dict = {}
        self._prefixes: dict[int, dict] = {}
        self._decode_fn = None
        # pipelined mode: the not-yet-consumed previous chunk —
        # (emits, lives, slot->request snapshot at dispatch)
        self._pending = None

    # --------------------------------------------------------------- paging
    def _pages_for(self, cols: int) -> int:
        return -(-cols // self.page)

    def _eff_prompt(self, req) -> list:
        """The prompt to (re)prefill: the original prompt plus any tokens
        already generated — nonempty ``tokens`` on a QUEUED request means it
        was preempted (pool pressure) and resumes by recomputing its KV from
        the full history (token-identical: chunked-prefill parity covers the
        prefill-vs-decode numerics)."""
        return req.prompt_ids + req.tokens if req.tokens else req.prompt_ids

    def _own_bucket(self, req) -> int:
        """Bucketed column span of the request's OWN prefill region (for
        prefix requests that is just the suffix; prefix pages are shared)."""
        return _bucket(max(len(self._eff_prompt(req)), 1), self.bucket_multiple)

    def _own_pages_needed(self, req) -> int:
        """WORST-CASE pages the request's OWN logical region can ever span
        (prompt bucket + full remaining budget + speculative slack).  Used
        for the submit-time pool-ceiling check and the chunked-prefill
        path's eager reservation; normal admission reserves only
        ``_initial_own_pages`` and grows on demand."""
        slack = self.K + 1 if self.K else 0
        remaining = req.max_new_tokens - len(req.tokens)
        return self._pages_for(self._own_bucket(req) + remaining + slack)

    def _initial_own_pages(self, req) -> int:
        """Pages to reserve at admission: the prompt bucket plus one decode
        growth margin, NOT the full budget — eager worst-case reservation is
        what starved admission at small pools (r4: paged60 admitted ~half
        the slots, 0.49x batched)."""
        return min(
            self._pages_for(self._own_bucket(req) + self._growth_margin()),
            self._own_pages_needed(req))

    def _growth_margin(self) -> int:
        """Columns a live slot can advance before the host next updates its
        table: two dispatches' worth (pipelining delays token delivery by
        one chunk) of chunk rounds x up-to-(K+1) written columns, plus the
        verify chunk's K+1 overhang past write_col."""
        tpr = self.K + 1 if self.K else 1
        return 2 * self.chunk * tpr + tpr

    def _need_own_pages(self, slot: int) -> int:
        """Own pages slot must hold before the NEXT dispatch."""
        meta, req = self._pmeta[slot], self._slot_req[slot]
        grown = len(req.tokens) - meta["admit_toks"]
        slack = self.K + 1 if self.K else 0
        remaining = req.max_new_tokens - meta["admit_toks"]
        cap = meta["base"] + remaining + slack
        return self._pages_for(
            min(meta["base"] + grown + self._growth_margin(), cap))

    def _append_pages(self, slot: int, new: list[int]):
        meta = self._pmeta[slot]
        start = meta["n_prefix"] + len(self._slot_pages[slot])
        self._slot_pages[slot].extend(new)
        self._table[slot, start: start + len(new)] = new
        self._table_dev = None

    def _preempt_slot(self, slot: int):
        """Evict a live slot under pool pressure: free its pages, flip it
        dead on device, and requeue it at the FRONT with its generated
        tokens kept — re-admission re-prefills prompt+tokens and continues
        with the remaining budget (vLLM-style recompute preemption)."""
        req = self._slot_req[slot]
        self._n_preempt += 1
        self._slot_req[slot] = None
        self._release_slot_pages(slot)
        self._free.append(slot)
        self._kill_slot_device(slot)
        self._queue.insert(0, req)

    def _ensure_page_coverage(self):
        """Grow every live slot's block table to cover the columns the next
        dispatch can write (allocation is on demand — admission reserved
        only the prompt).  A column whose table entry is still 0 would send
        the token's KV to the trash page and silently corrupt the stream,
        so coverage MUST lead the device's write frontier; the margin in
        _growth_margin over-covers by design.  When the free list can't
        satisfy a growth, the youngest admitted slot is preempted until it
        can — the submit-time ceiling check guarantees a lone slot always
        fits, so this terminates."""
        if not self.page:
            return
        # oldest-first so veterans grow before newcomers under pressure
        order = sorted(
            (s for s in range(self.B)
             if self._slot_req[s] is not None and self._pmeta[s] is not None),
            key=lambda s: self._pmeta[s]["seq"])
        for slot in order:
            if self._slot_req[slot] is None:  # preempted earlier this pass
                continue
            while True:
                have = len(self._slot_pages[slot])
                delta = self._need_own_pages(slot) - have
                if delta <= 0:
                    break
                if delta <= len(self._free_pages):
                    self._append_pages(slot, self._alloc_pages(delta))
                    break
                victims = [s for s in order
                           if self._slot_req[s] is not None and s != slot]
                if victims:
                    self._preempt_slot(
                        max(victims, key=lambda s: self._pmeta[s]["seq"]))
                elif self._prefill_job is not None:
                    self._preempt_prefill_job()
                else:
                    # unreachable: a lone slot's worst case passed the
                    # submit-time pool-ceiling check, so have+free covers it
                    raise RuntimeError(
                        f"paged pool invariant broken: slot {slot} needs "
                        f"{delta} more pages, {len(self._free_pages)} free, "
                        "nothing left to preempt")

    def _preempt_prefill_job(self):
        """Abort the in-flight chunked-prefill job under pool pressure:
        free its eagerly reserved pages and requeue its request at the
        front (prefill restarts from scratch on re-admission)."""
        job, self._prefill_job = self._prefill_job, None
        self._n_preempt += 1
        self._free_pages.extend(job["pages"])
        self._free.append(job["slot"])
        self._queue.insert(0, job["req"])

    def _alloc_pages(self, n: int) -> list[int]:
        ids, self._free_pages = self._free_pages[:n], self._free_pages[n:]
        assert len(ids) == n, "admission must gate on the free list"
        self._peak_pages = max(
            self._peak_pages, self.NP - 1 - len(self._free_pages))
        return ids

    def _assign_pages(self, slot: int, own: list[int], prefix_pages=()):
        self._slot_pages[slot] = own
        row = np.zeros((self.MP,), np.int32)
        ids = list(prefix_pages) + own
        row[: len(ids)] = ids
        self._table[slot] = row
        self._table_dev = None

    def _release_slot_pages(self, slot: int):
        """Retire a slot: free its own pages (shared prefix pages are never
        freed) and point its table row at the trash page so later-dispatched
        chunks' garbage writes for the dead row land nowhere live.  Chunks
        already in flight use the old table snapshot, but the device queue
        runs them BEFORE any insert that could re-fill the freed pages, and
        decode-region garbage stays invisible behind the new owner's
        kv_valid until the owner itself writes."""
        if not self.page:
            return
        self._free_pages.extend(self._slot_pages[slot])
        self._slot_pages[slot] = []
        self._pmeta[slot] = None
        self._table[slot] = 0
        self._table_dev = None

    def _table_device(self):
        if self._table_dev is None:
            self._table_dev = jnp.asarray(self._table)
        return self._table_dev

    def _attach_table(self, cache, table):
        """Merge the dispatch-time block-table snapshot into the cache dict
        (what routes writes/attention to the paged path — models/llama.py
        _cache_write_per_row, ops/decode_attention.py)."""
        if not self.page:
            return cache
        cache = dict(cache)
        cache["table"] = table
        return cache

    def _detach_table(self, cache):
        """Strip the table before the cache re-enters the donated state (the
        table is host-owned; the state's pytree structure excludes it)."""
        if not self.page:
            return cache
        cache = dict(cache)
        cache.pop("table", None)
        return cache

    def _scatter_pages(self, cache, slab, page_ids, from_col: int = 0):
        """Write a contiguous [L,1,H,S,D] slab's columns ``from_col:`` into
        pool pages ``page_ids`` (a traced [n] vector; S - from_col must be
        n·page, guaranteed by page-aligned buckets).

        Statically unrolled per-page ``dynamic_update_slice`` chain — one
        [L,H,1,P,D] DMA per page, in-place on the donated pool.  The batched
        formulation (``.at[:, :, page_ids].set``) lowers to an XLA scatter
        that copies the WHOLE pool per insert — measured 81 tok/s (0.49x the
        batched baseline) on the serve-bench paged60 leg at 7B before this
        rewrite, the same pathology _cache_write_per_row fixed for the dense
        verify path (models/llama.py)."""
        P = self.page
        out = dict(cache)
        n = (slab["k"].shape[3] - from_col) // P
        for key in ("k", "v"):
            s = slab[key][:, 0, :, from_col:, :]  # [L,H,S',D]
            L, H, Sp, D = s.shape
            pages = s.reshape(L, H, n, P, D)
            dst = out[key]
            for i in range(n):
                dst = jax.lax.dynamic_update_slice(
                    dst, pages[:, :, i][:, :, None], (0, 0, page_ids[i], 0, 0))
            out[key] = dst
            if key + "_s" in cache:
                sc = slab[key + "_s"][:, 0, :, 0, from_col:]  # [L,H,S']
                scp = sc.reshape(L, H, n, P)[:, :, :, None, :]  # [L,H,n,1,P]
                dsts = out[key + "_s"]
                for i in range(n):
                    dsts = jax.lax.dynamic_update_slice(
                        dsts, scp[:, :, i][:, :, None], (0, 0, page_ids[i], 0, 0))
                out[key + "_s"] = dsts
        return out

    # ------------------------------------------------------------------ jit
    def _fwd(self, params):
        extra = {}
        if self._lora is not None:
            extra = dict(lora=self._lora, lora_scale=1.0)
        if self.is_vlm:
            return partial(
                vlm_module(self.kind).forward, params, self.model_cfg,
                attn_impl=self.attn_impl, compute_dtype=self.compute_dtype,
                mesh=self.mesh, **extra,
            )
        return partial(
            decoder_module(self.dec_cfg).forward, params, self.model_cfg,
            attn_impl=self.attn_impl, compute_dtype=self.compute_dtype,
            mesh=self.mesh, **extra,
        )

    def _init_state(self):
        dec = decoder_module(self.dec_cfg)

        @jax.jit
        def init():
            if self.page:
                from multimodal_unlearning_tpu.models.llama import init_paged_kv_cache

                cache = init_paged_kv_cache(
                    self.dec_cfg, self.NP, self.page, dtype=self.cache_dtype)
            else:
                cache = dec.init_kv_cache(
                    self.dec_cfg, self.B, self.smax, dtype=self.cache_dtype)
            z = jnp.zeros((self.B,), jnp.int32)
            state = {
                "cache": cache,
                "kv_valid": jnp.zeros((self.B, self.smax), jnp.int32),
                "write_col": z,          # next cache column per slot
                "pos_next": z,           # next rope position per slot
                "token": z,              # last emitted token per slot
                "remaining": z,          # decode-step budget per slot
                "rope_delta": z,         # qwen2-vl M-RoPE decode offset
                "live": jnp.zeros((self.B,), bool),
            }
            if self.K:
                # token history + per-slot draft corpus for the 2-gram
                # lookup (-2 marks never-match slots, as in _spec_generate)
                state["ids_buf"] = jnp.full((self.B, self.smax), -2, jnp.int32)
                state["draft_ref"] = jnp.full((self.B, self.R), -2, jnp.int32)
            if self.do_sample:
                state["seed"] = z      # per-slot stream seed
                state["out_idx"] = z   # next output position (the fold index)
            if self._lora is not None:
                state["lora_id"] = z   # per-slot adapter index (0 = base)
            return state

        return init()

    def _insert_fn(self, sp: int, with_pixels: bool):
        """Compiled prefill+insert for prompt bucket ``sp``."""
        hit = self._insert_cache.get((sp, with_pixels))
        if hit is not None:
            return hit
        dec = decoder_module(self.dec_cfg)

        @partial(jax.jit, donate_argnums=(1,))
        def prefill_insert(params, state, ids, mask, pix, slot, max_new, dref,
                           seed, lora_id, page_ids):
            fwd = self._fwd(params)
            slab = dec.init_kv_cache(self.dec_cfg, 1, sp, dtype=self.cache_dtype)
            kw = dict(
                attention_mask=mask,
                kv_cache=slab, cache_offset=0, kv_valid_mask=mask,
            )
            if self.is_vlm:
                kw["pixel_values"] = pix
            if self._lora is not None:
                kw["lora_ids"] = lora_id[None]
            out = fwd(ids, last_logit_only=True, **kw)
            slab = out["kv_cache"]
            if self.do_sample:
                from multimodal_unlearning_tpu.evaluation.sampling import (
                    row_keys, sample_token)

                first = sample_token(
                    row_keys(seed[None]), jnp.zeros((1,), jnp.int32),
                    out["logits"][:, -1, :], self.temperature, self.top_k,
                    self.top_p)
            else:
                first = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(jnp.int32)
            lp0 = (jax.nn.log_softmax(
                out["logits"][:, -1, :].astype(jnp.float32), axis=-1)[0, first[0]]
                if self.want_lp else None)

            if self.page:
                cache = self._scatter_pages(state["cache"], slab, page_ids)
            else:
                cache = dict(state["cache"])
                for key in cache:
                    at = (0, slot, 0, 0, 0)
                    cache[key] = jax.lax.dynamic_update_slice(cache[key], slab[key], at)
            row = jnp.zeros((1, self.smax), jnp.int32).at[:, :sp].set(mask)
            finished_now = (first[0] == self.eos) if self.eos >= 0 else jnp.array(False)
            old_spec = (
                {"ids_buf": state["ids_buf"], "draft_ref": state["draft_ref"]}
                if self.K else None)
            old_sample = (
                {"seed": state["seed"], "out_idx": state["out_idx"]}
                if self.do_sample else None)
            old_lora = state["lora_id"] if self._lora is not None else None
            state = {
                "cache": cache,
                "kv_valid": jax.lax.dynamic_update_slice(state["kv_valid"], row, (slot, 0)),
                "write_col": state["write_col"].at[slot].set(sp),
                "pos_next": state["pos_next"].at[slot].set(jnp.sum(mask[0]).astype(jnp.int32)),
                "token": state["token"].at[slot].set(first[0]),
                "remaining": state["remaining"].at[slot].set(
                    jnp.where(finished_now, 0, max_new - 1)),
                "rope_delta": state["rope_delta"].at[slot].set(
                    out["rope_delta"][0].astype(jnp.int32)
                    if "rope_delta" in out and out.get("rope_delta") is not None
                    else 0),
                "live": state["live"].at[slot].set(~finished_now & (max_new - 1 > 0)),
            }
            if self.K:
                hist = jnp.full((1, self.smax), -2, jnp.int32).at[:, :sp].set(
                    jnp.where(mask > 0, ids.astype(jnp.int32), -2))
                state["ids_buf"] = jax.lax.dynamic_update_slice(
                    old_spec["ids_buf"], hist, (slot, 0))
                state["draft_ref"] = jax.lax.dynamic_update_slice(
                    old_spec["draft_ref"], dref, (slot, 0))
            if self.do_sample:
                state["seed"] = old_sample["seed"].at[slot].set(seed)
                state["out_idx"] = old_sample["out_idx"].at[slot].set(1)
            if self._lora is not None:
                state["lora_id"] = old_lora.at[slot].set(lora_id)
            return (state, first[0], lp0) if self.want_lp else (state, first[0])

        self._insert_cache[(sp, with_pixels)] = prefill_insert
        return prefill_insert

    def _prefix_fill_fn(self, P: int, with_pixels: bool):
        """Compiled standalone prompt forward into a fresh [L,1,H,P,D] slab
        (shared by the prefix cache and by chunked prefill's first chunk)."""
        key = (P, with_pixels)
        hit = self._prefix_fill_cache.get(key)
        if hit is not None:
            return hit
        dec = decoder_module(self.dec_cfg)

        @jax.jit
        def prefix_fill(params, ids, mask, pix, lora_id):
            fwd = self._fwd(params)
            slab = dec.init_kv_cache(self.dec_cfg, 1, P, dtype=self.cache_dtype)
            kw = dict(attention_mask=mask, kv_cache=slab,
                      cache_offset=0, kv_valid_mask=mask)
            if self.is_vlm:
                kw["pixel_values"] = pix
            if self._lora is not None:
                kw["lora_ids"] = lora_id[None]
            out = fwd(ids, last_logit_only=True, **kw)
            delta = (out["rope_delta"][0].astype(jnp.int32)
                     if out.get("rope_delta") is not None else jnp.int32(0))
            return out["kv_cache"], delta

        self._prefix_fill_cache[key] = prefix_fill
        return prefix_fill

    def _extend_fn(self, C: int, P: int):
        """Compiled slab extension for chunked prefill: C full (unpadded)
        prompt tokens run as one chunk_decode pass against a P-column slab
        (queries see the slab through kv_valid + their own chunk columns
        causally) and are written at columns P..P+C-1."""
        key = ("extend", C, P)
        hit = self._insert_cache.get(key)
        if hit is not None:
            return hit
        dec = decoder_module(self.dec_cfg)
        is_qwen = self.kind == "qwen2_vl"

        @jax.jit
        def extend(params, pslab, pvalid, plen, ids, rope_delta, lora_id):
            fwd = self._fwd(params)
            slab = dec.init_kv_cache(self.dec_cfg, 1, P + C, dtype=self.cache_dtype)
            for k in slab:
                slab[k] = jax.lax.dynamic_update_slice(
                    slab[k], pslab[k], (0, 0, 0, 0, 0))
            kv_row = jnp.zeros((1, P + C), jnp.int32).at[:, :P].set(pvalid)
            cols = jnp.arange(C, dtype=jnp.int32)
            dec_kw = dict(
                attention_mask=jnp.ones((1, C), jnp.int32),
                positions=plen + cols[None, :],
                kv_cache=slab, cache_offset=jnp.full((1,), P, jnp.int32),
                kv_valid_mask=kv_row, chunk_decode=True, last_logit_only=True,
            )
            if self.is_vlm:
                dec_kw["pixel_values"] = None
            if is_qwen:
                dec_kw["rope_delta"] = rope_delta[None]
            if self._lora is not None:
                dec_kw["lora_ids"] = lora_id[None]
            out = fwd(ids, **dec_kw)
            return out["kv_cache"], kv_row.at[:, P:].set(1)

        self._insert_cache[key] = extend
        return extend

    # -------------------------------------------------------- prefix cache
    def register_prefix(self, prompt_ids, pixel_values=None, adapter=None) -> int:
        """Prefill a shared prompt prefix (e.g. a system prompt, or an
        image + preamble) ONCE into a reusable KV slab; requests submitted
        with ``prefix=<id>`` prefill only their suffix against it.

        The slab is copied into the slot's cache columns at insert — the
        saving is the recomputation (one prefix forward total instead of
        one per request), not cache memory.  Left-padded to its bucket like
        any prompt, so suffix columns continue contiguously.  Qwen2-VL
        prefixes carry their M-RoPE ``rope_delta``: text suffixes continue
        as decode-style offset positions (models/qwen2_vl.py:forward)."""
        P = _bucket(len(prompt_ids), self.bucket_multiple)
        ids = np.full((1, P), self.pad_id, np.int32)
        mask = np.zeros((1, P), np.int32)
        ids[0, P - len(prompt_ids):] = prompt_ids
        mask[0, P - len(prompt_ids):] = 1
        pix = None
        if pixel_values is not None:
            pix = jnp.asarray(np.asarray(pixel_values)[None], self.compute_dtype)

        if adapter is not None and adapter not in self._adapter_ids:
            raise KeyError(f"unknown adapter {adapter!r}")
        aid = self._adapter_ids[adapter]
        fn = self._prefix_fill_fn(P, pixel_values is not None)
        slab, rope_delta = fn(self.params, jnp.asarray(ids), jnp.asarray(mask),
                              pix, jnp.int32(aid))
        pages = []
        if self.page:
            # scatter the prefix ONCE into shared pool pages (never freed);
            # every request's table references them zero-copy, vs the dense
            # path's per-slot slab copy at insert.  Register prefixes BEFORE
            # submitting requests: pinning pages later shrinks the ceiling
            # already-queued requests were admitted against.
            need = P // self.page
            if need > len(self._free_pages):
                raise ValueError(
                    f"prefix needs {need} pool pages but only "
                    f"{len(self._free_pages)} are free (kv_pool_pages; "
                    "register prefixes before submitting requests)")
            pages = self._alloc_pages(need)
            if self._state is None:
                self._state = self._init_state()
            key = ("pscatter", P)
            scat = self._insert_cache.get(key)
            if scat is None:
                @partial(jax.jit, donate_argnums=(0,))
                def scat(state, slab, page_ids):
                    state = dict(state)
                    state["cache"] = self._scatter_pages(
                        state["cache"], slab, page_ids)
                    return state

                self._insert_cache[key] = scat
            self._state = scat(self._state, slab,
                               jnp.asarray(pages, jnp.int32))
        pid = len(self._prefixes)
        hist = np.where(mask[0] > 0, ids[0], -2).astype(np.int32)
        self._prefixes[pid] = dict(
            slab=slab, mask=mask, plen=len(prompt_ids), P=P, hist=hist,
            adapter=adapter, rope_delta=int(rope_delta), pages=pages)
        return pid

    def _suffix_insert_fn(self, sp: int, P: int, shared_prefix: bool = False):
        """Compiled suffix-prefill+insert: the prefix slab lands in cache
        columns 0..P-1, the RIGHT-padded suffix runs as one chunk_decode
        pass (queries read the prefix through kv_valid + their own chunk
        columns causally) written at columns P..P+sp-1.

        Paged mode: ``shared_prefix`` skips scattering the prefix columns —
        the slot's table row already points at the prefix's SHARED pool
        pages (register_prefix wrote them once), so only the suffix pages
        land; chunked prefill passes shared_prefix=False and scatters the
        whole slab into slot-owned pages."""
        key = ("suffix", sp, P, shared_prefix)
        hit = self._insert_cache.get(key)
        if hit is not None:
            return hit
        dec = decoder_module(self.dec_cfg)

        @partial(jax.jit, donate_argnums=(1,))
        def suffix_insert(params, state, pslab, pvalid, phist, plen,
                          ids, n_sfx, slot, max_new, dref, seed, lora_id,
                          rope_delta, page_ids):
            fwd = self._fwd(params)
            slab = dec.init_kv_cache(self.dec_cfg, 1, P + sp, dtype=self.cache_dtype)
            for k in slab:
                slab[k] = jax.lax.dynamic_update_slice(
                    slab[k], pslab[k], (0, 0, 0, 0, 0))
            kv_row = jnp.zeros((1, P + sp), jnp.int32).at[:, :P].set(pvalid)
            sfx_cols = jnp.arange(sp, dtype=jnp.int32)
            dec_kw = dict(
                attention_mask=jnp.ones((1, sp), jnp.int32),
                positions=plen + sfx_cols[None, :],
                kv_cache=slab, cache_offset=jnp.full((1,), P, jnp.int32),
                kv_valid_mask=kv_row, chunk_decode=True,
            )
            if self.is_vlm:
                dec_kw["pixel_values"] = None
            if self.kind == "qwen2_vl":
                # M-RoPE: suffix positions continue decode-style, offset by
                # the prefix's rope delta
                dec_kw["rope_delta"] = rope_delta[None]
            if self._lora is not None:
                dec_kw["lora_ids"] = lora_id[None]
            out = fwd(ids, **dec_kw)
            slab = out["kv_cache"]
            last = out["logits"][0, n_sfx - 1, :][None]  # last REAL suffix position
            if self.do_sample:
                from multimodal_unlearning_tpu.evaluation.sampling import (
                    row_keys, sample_token)

                first = sample_token(
                    row_keys(seed[None]), jnp.zeros((1,), jnp.int32),
                    last, self.temperature, self.top_k, self.top_p)
            else:
                first = jnp.argmax(last, axis=-1).astype(jnp.int32)
            lp0 = (jax.nn.log_softmax(
                last.astype(jnp.float32), axis=-1)[0, first[0]]
                if self.want_lp else None)

            if self.page:
                cache = self._scatter_pages(
                    state["cache"], slab, page_ids,
                    from_col=P if shared_prefix else 0)
            else:
                cache = dict(state["cache"])
                for k in cache:
                    cache[k] = jax.lax.dynamic_update_slice(
                        cache[k], slab[k], (0, slot, 0, 0, 0))
            row = jnp.zeros((1, self.smax), jnp.int32).at[:, : P + sp].set(
                kv_row.at[:, P:].set((sfx_cols[None, :] < n_sfx).astype(jnp.int32)))
            finished_now = (first[0] == self.eos) if self.eos >= 0 else jnp.array(False)
            old_spec = (
                {"ids_buf": state["ids_buf"], "draft_ref": state["draft_ref"]}
                if self.K else None)
            old_sample = (
                {"seed": state["seed"], "out_idx": state["out_idx"]}
                if self.do_sample else None)
            old_lora = state["lora_id"] if self._lora is not None else None
            state = {
                "cache": cache,
                "kv_valid": jax.lax.dynamic_update_slice(state["kv_valid"], row, (slot, 0)),
                "write_col": state["write_col"].at[slot].set(P + n_sfx),
                "pos_next": state["pos_next"].at[slot].set(plen + n_sfx),
                "token": state["token"].at[slot].set(first[0]),
                "remaining": state["remaining"].at[slot].set(
                    jnp.where(finished_now, 0, max_new - 1)),
                "rope_delta": state["rope_delta"].at[slot].set(rope_delta),
                "live": state["live"].at[slot].set(~finished_now & (max_new - 1 > 0)),
            }
            if self.K:
                hist = jnp.full((1, self.smax), -2, jnp.int32)
                hist = hist.at[:, :P].set(phist)
                hist = hist.at[:, P: P + sp].set(
                    jnp.where(sfx_cols[None, :] < n_sfx, ids.astype(jnp.int32), -2))
                state["ids_buf"] = jax.lax.dynamic_update_slice(
                    old_spec["ids_buf"], hist, (slot, 0))
                state["draft_ref"] = jax.lax.dynamic_update_slice(
                    old_spec["draft_ref"], dref, (slot, 0))
            if self.do_sample:
                state["seed"] = old_sample["seed"].at[slot].set(seed)
                state["out_idx"] = old_sample["out_idx"].at[slot].set(1)
            if self._lora is not None:
                state["lora_id"] = old_lora.at[slot].set(lora_id)
            return (state, first[0], lp0) if self.want_lp else (state, first[0])

        self._insert_cache[key] = suffix_insert
        return suffix_insert

    def _decode(self):
        if self._decode_fn is not None:
            return self._decode_fn
        if self.K:
            self._decode_fn = self._make_spec_decode()
            return self._decode_fn
        B, eos, pad = self.B, self.eos, self.pad_id
        is_qwen = self.kind == "qwen2_vl"

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
        def decode_chunk(params, state, table, n):
            fwd = self._fwd(params)

            def step(s, _):
                live = s["live"] & (s["remaining"] > 0)
                kv_valid = s["kv_valid"].at[jnp.arange(B), s["write_col"]].max(
                    live.astype(jnp.int32))
                dec_kw = dict(
                    attention_mask=jnp.ones((B, 1), jnp.int32),
                    positions=s["pos_next"][:, None],
                    kv_cache=self._attach_table(s["cache"], table),
                    cache_offset=s["write_col"],
                    kv_valid_mask=kv_valid,
                )
                if self.is_vlm:
                    dec_kw["pixel_values"] = None
                if is_qwen:
                    dec_kw["rope_delta"] = s["rope_delta"]
                if self._lora is not None:
                    dec_kw["lora_ids"] = s["lora_id"]
                out = fwd(s["token"][:, None], **dec_kw)
                if self.do_sample:
                    from multimodal_unlearning_tpu.evaluation.sampling import (
                        row_keys, sample_token)

                    nxt = sample_token(
                        row_keys(s["seed"]), s["out_idx"],
                        out["logits"][:, -1, :], self.temperature,
                        self.top_k, self.top_p)
                else:
                    nxt = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(jnp.int32)
                emit = jnp.where(live, nxt, pad)
                if self.want_lp:
                    lp = jnp.take_along_axis(
                        jax.nn.log_softmax(
                            out["logits"][:, -1, :].astype(jnp.float32), axis=-1),
                        nxt[:, None], axis=1)[:, 0]
                hit_eos = (nxt == eos) if eos >= 0 else jnp.zeros((B,), bool)
                remaining = jnp.where(live, s["remaining"] - 1, s["remaining"])
                still = live & ~hit_eos & (remaining > 0)
                if self.do_sample:
                    s2_seed = s["seed"]
                    s2_idx = s["out_idx"] + live.astype(jnp.int32)
                if self._lora is not None:
                    s2_lora = s["lora_id"]
                s = {
                    "cache": self._detach_table(out["kv_cache"]),
                    "kv_valid": kv_valid,
                    "write_col": s["write_col"] + live.astype(jnp.int32),
                    "pos_next": s["pos_next"] + live.astype(jnp.int32),
                    "token": jnp.where(live, nxt, s["token"]),
                    "remaining": remaining,
                    "rope_delta": s["rope_delta"],
                    "live": still,
                }
                if self.do_sample:
                    s["seed"] = s2_seed
                    s["out_idx"] = s2_idx
                if self._lora is not None:
                    s["lora_id"] = s2_lora
                if self.want_lp:
                    return s, (emit, live, lp)
                return s, (emit, live)

            if self.want_lp:
                state, (emits, lives, lps) = jax.lax.scan(
                    step, state, None, length=n)
                return state, emits, (lives, lps)
            state, (emits, lives) = jax.lax.scan(step, state, None, length=n)
            return state, emits, lives

        self._decode_fn = decode_chunk
        return decode_chunk

    def _make_spec_decode(self):
        """Speculative decode chunk: each scan step is one prompt-lookup
        verify round per slot (evaluation/generate.py:_spec_generate, with
        the lookup corpus and history held in the engine state).  Emits up
        to K+1 tokens per slot per step; output is exactly greedy."""
        B, eos, pad, K, R = self.B, self.eos, self.pad_id, self.K, self.R
        smax = self.smax
        is_qwen = self.kind == "qwen2_vl"
        vocab = self.dec_cfg.vocab_size
        ar = jnp.arange(K + 1, dtype=jnp.int32)
        rows = jnp.arange(B, dtype=jnp.int32)
        W = R + 1 + smax
        col2 = jnp.arange(W, dtype=jnp.int32)

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
        def decode_chunk(params, state, table, n):
            fwd = self._fwd(params)

            def propose(ids_buf, draft_ref, token, cur):
                # most recent 2-gram match in [corpus | sep | history] ->
                # the K tokens that followed (generate.py:propose, but the
                # corpus is a per-slot state row)
                sep = jnp.full((B, 1), -5, jnp.int32)
                buf = jnp.concatenate([draft_ref, sep, ids_buf], axis=1)
                prev = ids_buf[rows, jnp.maximum(cur - 1, 0)]
                nxt = jnp.concatenate(
                    [buf[:, 1:], jnp.full((B, 1), -3, jnp.int32)], axis=1)
                m = (buf == prev[:, None]) & (nxt == token[:, None])
                pcol = col2[None, :]
                limit = jnp.where(pcol < R, R, R + 1 + cur[:, None])
                p_full = jnp.max(jnp.where(m & (pcol + 2 + K <= limit), pcol, -1), axis=1)
                p_any = jnp.max(jnp.where(m & (pcol + 2 < limit), pcol, -1), axis=1)
                p = jnp.where(p_full >= 0, p_full, p_any)
                cols = p[:, None] + 2 + ar[None, :K]
                vals = buf[rows[:, None], jnp.clip(cols, 0, W - 1)]
                p_limit = jnp.where(p < R, R, R + 1 + cur)
                known = (p[:, None] >= 0) & (cols < p_limit[:, None])
                return jnp.where(known, vals, -4)  # -4 never equals an argmax

            def step(s, _):
                live = s["live"] & (s["remaining"] > 0)
                cur, pos, token = s["write_col"], s["pos_next"], s["token"]
                draft = propose(s["ids_buf"], s["draft_ref"], token, cur)
                chunk = jnp.concatenate([token[:, None], draft], axis=1)
                chunk_in = jnp.clip(chunk, 0, vocab - 1)
                # retired slots still run the forward: clamp their stale
                # write columns so the K+1-wide per-row write stays in
                # bounds (live rows satisfy cur + K < smax by the submit
                # check; clamped garbage lands in never-valid columns)
                cur_w = jnp.minimum(cur, smax - (K + 1))
                dec_kw = dict(
                    attention_mask=jnp.ones((B, K + 1), jnp.int32),
                    positions=pos[:, None] + ar[None, :],
                    kv_cache=self._attach_table(s["cache"], table),
                    cache_offset=cur_w,
                    kv_valid_mask=s["kv_valid"], chunk_decode=True,
                )
                if self.is_vlm:
                    dec_kw["pixel_values"] = None
                if is_qwen:
                    dec_kw["rope_delta"] = s["rope_delta"]
                if self._lora is not None:
                    dec_kw["lora_ids"] = s["lora_id"]
                o = fwd(chunk_in, **dec_kw)
                preds = jnp.argmax(o["logits"], axis=-1).astype(jnp.int32)  # [B,K+1]
                if self.want_lp:
                    lps = jnp.take_along_axis(
                        jax.nn.log_softmax(o["logits"].astype(jnp.float32), axis=-1),
                        preds[:, :, None], axis=2)[:, :, 0]  # [B,K+1]

                matches = jnp.cumprod((draft == preds[:, :K]).astype(jnp.int32), axis=1)
                a = jnp.sum(matches, axis=1)                  # accepted 0..K
                n_emit = a + 1
                if eos >= 0:
                    is_eos = preds == eos
                    eos_idx = jnp.min(jnp.where(is_eos, ar[None, :], K + 1), axis=1)
                    n_emit = jnp.minimum(n_emit, eos_idx)     # eos not emitted
                    hit_eos = eos_idx <= a
                else:
                    hit_eos = jnp.zeros((B,), bool)
                n_emit = jnp.minimum(n_emit, s["remaining"])
                n_emit = jnp.where(live, n_emit, 0)
                emits = jnp.where(ar[None, :] < n_emit[:, None], preds, pad)

                # accepted context tokens chunk[0..a] extend history+validity
                acc_mask = (ar[None, :] <= a[:, None]) & live[:, None]
                ids_cols = jnp.where(acc_mask, cur_w[:, None] + ar[None, :], smax - 1)
                ids_vals = jnp.where(
                    acc_mask, chunk, s["ids_buf"][rows[:, None], ids_cols])
                ids_buf = s["ids_buf"].at[rows[:, None], ids_cols].set(ids_vals)
                kv_valid = s["kv_valid"].at[rows[:, None], ids_cols].max(
                    acc_mask.astype(jnp.int32))

                remaining = s["remaining"] - n_emit
                done = live & (hit_eos | (remaining <= 0))
                adv = jnp.where(live, a + 1, 0)
                s2_lora = s["lora_id"] if self._lora is not None else None
                s = {
                    "cache": self._detach_table(o["kv_cache"]),
                    "kv_valid": kv_valid,
                    "write_col": cur + adv, "pos_next": pos + adv,
                    "token": jnp.where(live, preds[rows, a], token),
                    "remaining": remaining,
                    "rope_delta": s["rope_delta"],
                    "live": live & ~done,
                    "ids_buf": ids_buf, "draft_ref": s["draft_ref"],
                }
                if s2_lora is not None:
                    s["lora_id"] = s2_lora
                if self.want_lp:
                    return s, (emits, n_emit, done, lps)
                return s, (emits, n_emit, done)

            if self.want_lp:
                state, (emits, n_emits, dones, lps) = jax.lax.scan(
                    step, state, None, length=n)
                return state, emits, (n_emits, dones, lps)
            state, (emits, n_emits, dones) = jax.lax.scan(step, state, None, length=n)
            return state, emits, (n_emits, dones)

        return decode_chunk

    # ----------------------------------------------------------------- host
    def submit(self, prompt_ids, max_new_tokens: int, pixel_values=None,
               draft_ref=None, sample_seed=None, prefix=None,
               adapter=None, stop=None) -> Request:
        sp = _bucket(len(prompt_ids), self.bucket_multiple)
        if prefix is not None:
            if not len(prompt_ids):
                raise ValueError("prefix requests need >= 1 suffix token")
            sp += self._prefixes[prefix]["P"]
        slack = self.K + 1 if self.K else 0  # verify chunk writes K past cur
        if sp + max_new_tokens + slack > self.smax:
            raise ValueError(
                f"prompt bucket {sp} + max_new {max_new_tokens} (+ speculative "
                f"slack {slack}) exceeds max_len {self.smax}")
        if self.page:
            need = self._pages_for(
                (sp if prefix is None
                 else _bucket(max(len(prompt_ids), 1), self.bucket_multiple))
                + max_new_tokens + slack)
            # pages a drained engine could ever free back: prefix pages are
            # pinned for the engine's lifetime
            ceiling = self.NP - 1 - sum(
                len(p["pages"]) for p in self._prefixes.values())
            if need > ceiling:
                raise ValueError(
                    f"request needs {need} pages but the pool can free at "
                    f"most {ceiling} (kv_pool_pages {self.NP}, minus pinned "
                    "prefix pages)")
        self._uid += 1
        req = Request(self._uid, list(prompt_ids), max_new_tokens, pixel_values)
        req.prefix = prefix
        if adapter is not None and adapter not in self._adapter_ids:
            raise KeyError(f"unknown adapter {adapter!r}; "
                           f"registered: {[k for k in self._adapter_ids if k]}")
        if prefix is not None:
            pre_ad = self._prefixes[prefix]["adapter"]
            if adapter is None:
                adapter = pre_ad
            elif adapter != pre_ad:
                raise ValueError(
                    f"prefix {prefix} was prefilled with adapter {pre_ad!r}; "
                    f"request asks for {adapter!r}")
        req.lora_id = self._adapter_ids[adapter]
        req.draft_ref = list(draft_ref or [])[: self.R]
        # stop sequences: token-id lists, host-checked on the emitted stream
        # (the matched suffix is truncated away, OpenAI convention)
        req.stop = [list(int(t) for t in s) for s in (stop or []) if len(s)]
        req.sample_seed = self._uid if sample_seed is None else int(sample_seed)
        req.submit_t = time.monotonic()
        self._queue.append(req)
        return req

    def _needs_chunked_prefill(self, req) -> bool:
        C = self.prefill_chunk
        if not C or req.prefix is not None or len(self._eff_prompt(req)) <= C:
            return False
        if req.pixel_values is not None:
            # image features splice at image-token positions during the
            # pixel-carrying first chunk — an image span crossing the chunk
            # boundary must prefill monolithically
            tid = getattr(self.model_cfg, "image_token_id", None)
            if tid is None or any(int(t) == tid
                                  for t in self._eff_prompt(req)[C:]):
                return False
        return True

    def _start_prefill_job(self, req, slot):
        """First chunk of a chunked prefill: exactly C (unpadded) prompt
        tokens through the standalone fill program (pixels ride here)."""
        C = self.prefill_chunk
        ids = np.asarray(self._eff_prompt(req)[:C], np.int32)[None]
        pix = None
        if req.pixel_values is not None:
            pix = jnp.asarray(req.pixel_values[None], self.compute_dtype)
        fn = self._prefix_fill_fn(C, req.pixel_values is not None)
        slab, delta = fn(self.params, jnp.asarray(ids),
                         jnp.ones((1, C), jnp.int32), pix, jnp.int32(req.lora_id))
        self._n_prefill_chunks += 1
        # paged: reserve the whole own region up front (admission gated on
        # it) but assign the table only at the final insert, so the dead
        # slot's garbage writes keep landing in the trash page until then
        pages = self._alloc_pages(self._own_pages_needed(req)) if self.page else None
        self._prefill_job = dict(
            req=req, slot=slot, slab=slab, P=C, pos=C, pages=pages,
            prompt=list(self._eff_prompt(req)),
            kv_row=jnp.ones((1, C), jnp.int32), rope_delta=delta)

    def _advance_prefill(self):
        """One more chunk of the in-flight chunked prefill; the final
        (right-padded) chunk lands through the suffix-insert program, which
        emits the first token and activates the slot."""
        job = self._prefill_job
        req, C = job["req"], self.prefill_chunk
        prompt = job["prompt"]
        rem = len(prompt) - job["pos"]
        self._n_prefill_chunks += 1
        if rem > C:
            fn = self._extend_fn(C, job["P"])
            ids = np.asarray(prompt[job["pos"]: job["pos"] + C], np.int32)[None]
            job["slab"], job["kv_row"] = fn(
                self.params, job["slab"], job["kv_row"], jnp.int32(job["pos"]),
                jnp.asarray(ids), job["rope_delta"], jnp.int32(req.lora_id))
            job["P"] += C
            job["pos"] += C
            return
        sp = _bucket(rem, self.bucket_multiple)
        ids = np.full((1, sp), self.pad_id, np.int32)
        ids[0, :rem] = prompt[job["pos"]:]
        hist = np.asarray(prompt[: job["pos"]], np.int32)[None]
        dref = np.full((1, self.R), -2, np.int32)
        if req.draft_ref:
            dref[0, : len(req.draft_ref)] = req.draft_ref
        page_ids = None
        if self.page:
            self._assign_pages(job["slot"], job["pages"])
            self._admit_seq += 1
            # chunked prefill reserved its whole own region eagerly, so
            # growth is a no-op for this slot (need <= len(own) always)
            self._pmeta[job["slot"]] = dict(
                base=job["P"] + sp, admit_toks=len(req.tokens),
                n_prefix=0, seq=self._admit_seq)
            page_ids = jnp.asarray(
                job["pages"][: (job["P"] + sp) // self.page], jnp.int32)
        fn = self._suffix_insert_fn(sp, job["P"])
        out = fn(
            self.params, self._state, job["slab"], job["kv_row"],
            jnp.asarray(hist), jnp.int32(job["pos"]),
            jnp.asarray(ids), jnp.int32(rem),
            jnp.int32(job["slot"]),
            jnp.int32(req.max_new_tokens - len(req.tokens)),
            jnp.asarray(dref), jnp.int32(req.sample_seed),
            jnp.int32(req.lora_id), job["rope_delta"], page_ids,
        )
        self._state, first = out[0], out[1]
        self._prefill_job = None
        self._after_insert(req, job["slot"], first,
                           out[2] if self.want_lp else None)

    def _fill_slots(self):
        if self._prefill_job is not None:
            self._advance_prefill()
        while self._free and self._queue:
            # paged admission control: the head request waits (strict FIFO)
            # until retirements return enough pages for its PROMPT + one
            # growth margin (decode pages are allocated on demand; full
            # budgets are NOT reserved up front — see _ensure_page_coverage)
            needs_chunked = self._needs_chunked_prefill(self._queue[0])
            if self.page and (len(self._free_pages)
                              < (self._own_pages_needed(self._queue[0])
                                 if needs_chunked  # eager path reserves all
                                 else self._initial_own_pages(self._queue[0]))):
                break
            # strict FIFO: a head-of-queue long prompt waits for the active
            # chunked-prefill job rather than being overtaken
            if needs_chunked:
                if self._prefill_job is not None:
                    break
                self._start_prefill_job(self._queue.pop(0), self._free.pop(0))
                continue
            req = self._queue.pop(0)
            slot = self._free.pop(0)
            if req.prefix is not None:
                self._fill_with_prefix(req, slot)
                continue
            prompt = self._eff_prompt(req)
            remaining = req.max_new_tokens - len(req.tokens)
            sp = _bucket(len(prompt), self.bucket_multiple)
            ids = np.full((1, sp), self.pad_id, np.int32)
            mask = np.zeros((1, sp), np.int32)
            ids[0, sp - len(prompt):] = prompt
            mask[0, sp - len(prompt):] = 1
            pix = None
            if req.pixel_values is not None:
                pix = jnp.asarray(req.pixel_values[None], self.compute_dtype)
            dref = np.full((1, self.R), -2, np.int32)
            if req.draft_ref:
                dref[0, : len(req.draft_ref)] = req.draft_ref
            page_ids = None
            if self.page:
                own = self._alloc_pages(self._initial_own_pages(req))
                self._assign_pages(slot, own)
                self._admit_seq += 1
                self._pmeta[slot] = dict(
                    base=sp, admit_toks=len(req.tokens), n_prefix=0,
                    seq=self._admit_seq)
                page_ids = jnp.asarray(own[: sp // self.page], jnp.int32)
            fn = self._insert_fn(sp, req.pixel_values is not None)
            out = fn(
                self.params, self._state, jnp.asarray(ids), jnp.asarray(mask),
                pix, jnp.int32(slot), jnp.int32(remaining),
                jnp.asarray(dref), jnp.int32(req.sample_seed),
                jnp.int32(req.lora_id), page_ids,
            )
            self._state, first = out[0], out[1]
            self._after_insert(req, slot, first,
                               out[2] if self.want_lp else None)

    def _fill_with_prefix(self, req, slot):
        """Admit a request against a registered prefix: copy the cached
        slab, prefill only the RIGHT-padded suffix (chunk_decode pass)."""
        pre = self._prefixes[req.prefix]
        suffix = self._eff_prompt(req)
        remaining = req.max_new_tokens - len(req.tokens)
        sp = _bucket(max(len(suffix), 1), self.bucket_multiple)
        ids = np.full((1, sp), self.pad_id, np.int32)
        ids[0, : len(suffix)] = suffix
        dref = np.full((1, self.R), -2, np.int32)
        if req.draft_ref:
            dref[0, : len(req.draft_ref)] = req.draft_ref
        page_ids = None
        if self.page:
            # zero-copy prefix sharing: the table's leading entries point at
            # the prefix's pool pages; only the suffix pages are slot-owned
            own = self._alloc_pages(self._initial_own_pages(req))
            self._assign_pages(slot, own, prefix_pages=pre["pages"])
            self._admit_seq += 1
            self._pmeta[slot] = dict(
                base=sp, admit_toks=len(req.tokens),
                n_prefix=len(pre["pages"]), seq=self._admit_seq)
            page_ids = jnp.asarray(own[: sp // self.page], jnp.int32)
        fn = self._suffix_insert_fn(sp, pre["P"], shared_prefix=bool(self.page))
        out = fn(
            self.params, self._state, pre["slab"], jnp.asarray(pre["mask"]),
            jnp.asarray(pre["hist"][None]), jnp.int32(pre["plen"]),
            jnp.asarray(ids), jnp.int32(len(suffix)),
            jnp.int32(slot), jnp.int32(remaining),
            jnp.asarray(dref), jnp.int32(req.sample_seed),
            jnp.int32(req.lora_id), jnp.int32(pre["rope_delta"]), page_ids,
        )
        self._state, first = out[0], out[1]
        self._after_insert(req, slot, first,
                           out[2] if self.want_lp else None)

    def _apply_stop(self, req, old_len: int) -> bool:
        """Scan generated tokens appended since ``old_len`` for any stop
        sequence (which may reach back across the boundary); on a match,
        truncate the stream BEFORE the stop (tokens + logprobs)."""
        if not req.stop:
            return False
        toks = req.tokens
        for end in range(old_len + 1, len(toks) + 1):
            for s in req.stop:
                L = len(s)
                if end >= L and toks[end - L: end] == s:
                    del toks[end - L:]
                    del req.logprobs[end - L:]
                    return True
        return False

    def _kill_slot_device(self, slot: int):
        """Flip a slot dead ON DEVICE (live=False, remaining=0) — used when
        the HOST retires a request early (stop sequence, cancel) and the
        device would otherwise keep decoding the dead slot until its budget
        ran out."""
        kill = self._insert_cache.get("kill")
        if kill is None:
            @partial(jax.jit, donate_argnums=(0,))
            def kill(state, slot):
                state = dict(state)
                state["live"] = state["live"].at[slot].set(False)
                state["remaining"] = state["remaining"].at[slot].set(0)
                return state

            self._insert_cache["kill"] = kill
        self._state = kill(self._state, jnp.int32(slot))

    def _retire(self, req, slot: int, *, kill_device: bool = False):
        req.done = True
        req.done_t = time.monotonic()
        if self._slot_req[slot] is req:
            self._slot_req[slot] = None
            self._release_slot_pages(slot)
            self._free.append(slot)
            if kill_device:
                self._kill_slot_device(slot)
        elif req in self._queue:  # finished while preempted-and-queued
            self._queue.remove(req)

    def cancel(self, req) -> bool:
        """Abort a request: drop it from the queue, or retire its slot /
        chunked-prefill job (partial tokens stay on the request).  Returns
        False if it had already completed."""
        if req.done:
            return False
        if req in self._queue:
            self._queue.remove(req)
            req.done = True
            req.done_t = time.monotonic()
            return True
        if self._prefill_job is not None and self._prefill_job["req"] is req:
            job, self._prefill_job = self._prefill_job, None
            if self.page:
                self._free_pages.extend(job["pages"])
            req.done = True
            req.done_t = time.monotonic()
            self._free.append(job["slot"])
            return True
        for slot, r in enumerate(self._slot_req):
            if r is req:
                self._retire(req, slot, kill_device=True)
                return True
        # not ours (or already fully delivered): _after_insert assigns
        # _slot_req synchronously, so a live request of THIS engine is
        # always found above — don't claim to have cancelled a foreign one
        return False

    def _after_insert(self, req, slot, first, lp0=None):
        self._n_prefill += 1
        first = int(first)
        now = time.monotonic()
        if not req.first_t:  # keep the ORIGINAL TTFT across preemptions
            req.first_t = now
        if self.eos >= 0 and first == self.eos:
            req.done = True
            req.done_t = now
            self._release_slot_pages(slot)
            self._free.append(slot)
        else:
            req.tokens.append(first)
            if lp0 is not None:
                req.logprobs.append(float(lp0))
            if self._apply_stop(req, len(req.tokens) - 1):
                # the insert marked the slot live on device; flip it back
                self._retire(req, slot, kill_device=True)
            elif len(req.tokens) >= req.max_new_tokens:  # budget spans preemptions
                req.done = True
                req.done_t = now
                self._release_slot_pages(slot)
                self._free.append(slot)
            else:
                self._slot_req[slot] = req

    def _consume(self, emits, aux, snapshot):
        """Deliver one chunk's emissions to its dispatch-time slot mapping
        and retire finished requests.  Retirement is decided from the
        emission arrays alone (eos seen / budget reached) — the device state
        may already have been donated into the NEXT chunk."""
        if self.K:
            return self._consume_spec(emits, aux, snapshot)
        lps = None
        if self.want_lp:
            aux, lps = aux
            lps = np.asarray(lps)
        lives = aux
        emits = np.asarray(emits)   # [T, B] — blocks until the chunk lands
        lives = np.asarray(lives)
        self._n_live_rounds += int(lives.sum())
        for b, req in enumerate(snapshot):
            if req is None or req.done:
                continue
            hit_eos = False
            for t in range(self.chunk):
                if not lives[t, b]:
                    break
                tok = int(emits[t, b])
                if self.eos >= 0 and tok == self.eos:
                    hit_eos = True
                    break
                req.tokens.append(tok)
                if lps is not None:
                    req.logprobs.append(float(lps[t, b]))
                self._n_emitted += 1
                if self._apply_stop(req, len(req.tokens) - 1):
                    self._retire(req, b, kill_device=True)
                    break
            if req.done:
                continue
            if hit_eos or len(req.tokens) >= req.max_new_tokens:
                req.done = True
                req.done_t = time.monotonic()
                if self._slot_req[b] is req:
                    self._slot_req[b] = None
                    self._release_slot_pages(b)
                    self._free.append(b)
                elif req in self._queue:
                    # preempted after this chunk was dispatched, then its
                    # in-flight tokens completed it — never re-admit
                    self._queue.remove(req)

    def _consume_spec(self, emits, aux, snapshot):
        """Spec-mode delivery: step t emitted ``n_emits[t,b]`` verified
        tokens for slot b (eos never emitted; ``dones`` marks eos/budget
        retirement — decided on device, so the host just replays it)."""
        lps = None
        if self.want_lp:
            n_emits, dones, lps = aux
            lps = np.asarray(lps)       # [T, B, K+1]
        else:
            n_emits, dones = aux
        emits = np.asarray(emits)       # [T, B, K+1] — blocks on the chunk
        n_emits = np.asarray(n_emits)   # [T, B]
        dones = np.asarray(dones)
        self._n_live_rounds += int((n_emits > 0).sum())       # [T, B]
        for b, req in enumerate(snapshot):
            if req is None or req.done:
                continue
            for t in range(self.chunk):
                old = len(req.tokens)
                req.tokens.extend(int(x) for x in emits[t, b, : n_emits[t, b]])
                if lps is not None:
                    req.logprobs.extend(float(x) for x in lps[t, b, : n_emits[t, b]])
                self._n_emitted += int(n_emits[t, b])
                if self._apply_stop(req, old):
                    self._retire(req, b, kill_device=True)
                    break
                if dones[t, b]:
                    req.done = True
                    req.done_t = time.monotonic()
                    if self._slot_req[b] is req:
                        self._slot_req[b] = None
                        self._release_slot_pages(b)
                        self._free.append(b)
                    elif req in self._queue:  # completed while preempted
                        self._queue.remove(req)
                    break

    def step(self):
        """One engine iteration: fill free slots, dispatch one decode chunk,
        deliver the PREVIOUS chunk's tokens.

        Pipelined (default): chunk k+1 is dispatched before chunk k's
        emissions are read, so the device queue never drains — host
        bookkeeping overlaps device compute.  Slot refills land one chunk
        late (a freed slot idles one chunk); correctness is unaffected
        because the device tracks per-slot liveness itself.  ``pipeline=
        False`` reverts to dispatch→wait→deliver per chunk."""
        if self._state is None:
            self._state = self._init_state()
        self._fill_slots()
        self._ensure_page_coverage()
        prev, self._pending = self._pending, None
        if any(r is not None for r in self._slot_req):
            decode = self._decode()
            self._n_dispatch += 1
            snapshot = list(self._slot_req)
            table = self._table_device() if self.page else None
            self._state, emits, aux = decode(
                self.params, self._state, table, self.chunk)
            if self.pipeline:
                self._pending = (emits, aux, snapshot)
            else:
                if prev is not None:  # mode flipped mid-flight
                    self._consume(*prev)
                    prev = None
                self._consume(emits, aux, snapshot)
        if prev is not None:
            self._consume(*prev)

    def run(self):
        """Drain the queue and all in-flight slots."""
        while (self._queue or self._pending is not None
               or self._prefill_job is not None
               or any(r is not None for r in self._slot_req)):
            self.step()

    def stats(self) -> dict:
        """Engine counters: decode dispatches, prefills, per-slot live
        rounds and emitted tokens.  ``tokens_per_round`` is the decode
        efficiency — 1.0 for plain greedy, up to K+1 under speculation
        (the measured acceptance)."""
        rounds = max(self._n_live_rounds, 1)
        out = {
            "dispatches": self._n_dispatch,
            "prefills": self._n_prefill,
            "prefill_chunks": self._n_prefill_chunks,
            "live_rounds": self._n_live_rounds,
            "emitted": self._n_emitted,
            "tokens_per_round": self._n_emitted / rounds,
        }
        if self.page:
            out["pool_pages"] = self.NP - 1
            out["pool_pages_used"] = self.NP - 1 - len(self._free_pages)
            out["pool_pages_peak"] = self._peak_pages
            out["preemptions"] = self._n_preempt
        return out

    def drain(self, requests: list[Request]) -> list[list[int]]:
        """Run until the given requests complete; return their token lists."""
        while not all(r.done for r in requests):
            self.step()
        return [r.tokens for r in requests]
