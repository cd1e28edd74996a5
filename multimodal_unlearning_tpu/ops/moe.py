"""Mixture-of-experts MLP: Mixtral-style top-k routing, TPU-native.

Beyond-reference (the reference's model zoo is dense-only — SURVEY.md §2.2);
added so the framework covers the MoE decoder families (Mixtral-8x7B et al.)
users finetune/unlearn today.  HF semantics anchor:
``transformers.models.mixtral.modeling_mixtral.MixtralSparseMoeBlock`` —
softmax over ALL expert logits in fp32, top-k, renormalize the selected
weights to sum 1 (logit-parity tested in tests/test_moe.py).

Two dispatch modes, both pure einsums so GSPMD partitions the expert dim
over the ``expert`` mesh axis (parallel/ep.py) with compiler-inserted
collectives — no manual all-to-alls:

- ``dense``  — every expert computes every token, the combine weights zero
  the unselected pairs.  EXACT (dropless) and the numerics-parity mode;
  compute is E/k× the ideal, but expert parallelism divides it by
  ``mesh.expert`` and tiny-k models (k=2, E=8) stay MXU-bound.  Used for
  eval/decode (bit-exact greedy) and small-scale training.
- ``capacity`` — Switch/T5X-style one-hot dispatch/combine with a fixed
  per-expert capacity C = ceil(cf·k·S/E); tokens overflowing an expert fall
  through (their MLP delta is 0 — the residual carries them).  Compute is
  cf·k·S tokens of FFN — the production train path at scale.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def router_weights(h, router_w, k):
    """Mixtral routing: fp32 softmax over all experts → top-k → renormalize.

    Returns (combine [B,S,E] fp32 — zero at unselected experts, probs
    [B,S,E] fp32 — the full pre-top-k distribution, for the aux loss).
    """
    logits = (h @ router_w.astype(h.dtype)).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(topi, probs.shape[-1], dtype=jnp.float32) * topv[..., None],
        axis=-2,
    )
    return combine, probs


def _dq(w, dtype):
    """Dequantize a QTensor leaf ({'q','s'} — int8 or grouped int4) to
    ``dtype``; pass floats through."""
    if isinstance(w, dict):
        from multimodal_unlearning_tpu.utils.quantize import dequantize_leaf

        return dequantize_leaf(w, dtype)
    return w.astype(dtype)


def moe_mlp(
    h,
    router_w,
    gate_w,
    up_w,
    down_w,
    k: int,
    *,
    route: str = "dense",
    capacity_factor: float = 1.25,
    int8_compute: bool = False,
):
    """MoE SwiGLU MLP.  h [B,S,H]; router_w [H,E]; gate/up [E,H,I];
    down [E,I,H] — float or int8 QTensor leaves.  Returns [B,S,H] in h.dtype.

    ``int8_compute`` + QTensor expert stacks runs the dense route's expert
    matmuls on the int8 MXU (W8A8, utils/quantize.py int8_moe_*) with one
    shared activation quantization for gate/up; otherwise QTensor leaves
    dequantize per layer (W8A16)."""
    combine, _ = router_weights(h, _dq(router_w, h.dtype), k)
    if route == "dense":
        if int8_compute and isinstance(gate_w, dict) and "q" in gate_w and gate_w["q"].dtype == jnp.int8:
            return _dense_moe_w8a8(h, combine, gate_w, up_w, down_w)
        return _dense_moe(h, combine, *(_dq(w, h.dtype) for w in (gate_w, up_w, down_w)))
    if route == "capacity":
        return _capacity_moe(
            h, combine, *(_dq(w, h.dtype) for w in (gate_w, up_w, down_w)),
            k, capacity_factor,
        )
    raise ValueError(f"unknown moe route {route!r}")


def _swiglu(g, u, dtype):
    # promote, never demote (HF act_fn runs in native dtype; f64 parity)
    return jax.nn.silu(g.astype(jnp.promote_types(g.dtype, jnp.float32))).astype(dtype) * u


def _dense_moe(h, combine, gate_w, up_w, down_w):
    dt = h.dtype
    # expert-leading layout: every einsum carries 'e' so GSPMD shards the
    # expert dim of the weights AND intermediates over the 'expert' axis;
    # the final contraction over e lowers to a reduce-scatter/all-reduce
    g = jnp.einsum("bsh,ehi->ebsi", h, gate_w.astype(dt))
    u = jnp.einsum("bsh,ehi->ebsi", h, up_w.astype(dt))
    ff = _swiglu(g, u, dt) * combine.transpose(2, 0, 1)[..., None].astype(dt)
    return jnp.einsum("ebsi,eih->bsh", ff, down_w.astype(dt))


def _dense_moe_w8a8(h, combine, gate_qt, up_qt, down_qt):
    """Dense (dropless) route on the int8 MXU: per-row dynamically quantized
    activations against the int8 expert stacks; dequantized-bf16 dx backward
    (the stacks are frozen under LoRA forget runs)."""
    from multimodal_unlearning_tpu.utils.quantize import (
        int8_moe_down,
        int8_moe_up_group,
    )

    dt = h.dtype
    g, u = int8_moe_up_group(
        h, gate_qt["q"], gate_qt["s"], up_qt["q"], up_qt["s"]
    )
    ff = _swiglu(g, u, dt) * combine.transpose(2, 0, 1)[..., None].astype(dt)
    return jnp.sum(int8_moe_down(ff, down_qt["q"], down_qt["s"]), axis=0)


def expert_capacity(S: int, E: int, k: int, capacity_factor: float) -> int:
    """Static per-expert token budget, lane-padded to a multiple of 8."""
    c = int(math.ceil(capacity_factor * k * S / E))
    return max(8, -(-c // 8) * 8)


def _capacity_moe(h, combine, gate_w, up_w, down_w, k, capacity_factor):
    B, S, H = h.shape
    E = gate_w.shape[0]
    dt = h.dtype
    C = expert_capacity(S, E, k, capacity_factor)

    # per-token expert picks in combine-weight order (top-1 first): tokens
    # compete for capacity in token order, like the T5X router
    topv, topi = jax.lax.top_k(combine, k)                     # [B,S,k]
    sel = jax.nn.one_hot(topi, E, dtype=jnp.int32)             # [B,S,k,E]
    flat = sel.reshape(B, S * k, E)
    # position of each selection within its expert's queue (flat is one-hot
    # over experts, so the masked sum reads the count-before at the pick)
    pos = jnp.sum((jnp.cumsum(flat, axis=1) - flat) * flat, axis=-1)
    keep = pos < C                                             # [B,S*k]
    dispatch = (
        flat.astype(dt)[..., None]
        * jax.nn.one_hot(pos, C, dtype=dt)[:, :, None, :]
        * keep.astype(dt)[..., None, None]
    )                                                          # [B,T,E,C]
    comb = dispatch * topv.reshape(B, S * k).astype(dt)[..., None, None]

    h_rep = jnp.repeat(h, k, axis=1)                           # [B,S*k,H]
    x_e = jnp.einsum("btec,bth->ebch", dispatch, h_rep)        # [E,B,C,H]
    g = jnp.einsum("ebch,ehi->ebci", x_e, gate_w.astype(dt))
    u = jnp.einsum("ebch,ehi->ebci", x_e, up_w.astype(dt))
    y_e = jnp.einsum("ebci,eih->ebch", _swiglu(g, u, dt), down_w.astype(dt))
    y = jnp.einsum("ebch,btec->bth", y_e, comb)                # [B,S*k,H]
    return y.reshape(B, S, k, H).sum(axis=2)


def load_balance_aux_loss(probs, combine):
    """Switch-style auxiliary load-balancing loss: E · Σ_e f_e · P_e, where
    f_e is the fraction of routed (token, slot) assignments to expert e and
    P_e the mean router probability.  Minimized (=1) at uniform routing.
    Provided for MoE *pretraining* loops; the unlearning losses finetune an
    already-balanced pretrained router and do not add it by default."""
    E = probs.shape[-1]
    f = jnp.mean((combine > 0).astype(jnp.float32), axis=(0, 1))
    p = jnp.mean(probs, axis=(0, 1))
    return E * jnp.sum(f * p)
