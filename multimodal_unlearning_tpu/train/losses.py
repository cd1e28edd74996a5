"""The unlearning loss taxonomy — pure functions over model applies.

Faithful re-implementation of the reference dispatch
(mm/trainer.py:168-483, nlp/dataloader.py:94-494), with torch semantics
reproduced exactly:

- ``ce_loss``      ≙ HF ``outputs.loss``: mean CE over shifted non-(-100)
                     labels (image-token positions carry -100 here, so no
                     logit-row surgery is needed — see models/llava.py).
- ``seq_sum_ce``   ≙ ``get_batch_loss`` (mm/trainer_utils.py:73-81):
                     per-sequence summed CE, ignore -100.
- ``kl_div(i, t)`` ≙ ``F.kl_div(input, target, reduction="batchmean",
                     log_target=True)`` over [B·S, V] flattened log-probs:
                     sum(exp(t)·(t−i)) / (B·S)  — note torch's input is the
                     *approximating* distribution, i.e. this is KL(t‖i).
- DPO keeps the reference's effective final loss (the computed preference
  loss is overwritten at mm/trainer.py:394-396 — replicated, with the true
  DPO loss available under ``dpo_fix``).

Each loss fn takes the batch dict (split → tensors) plus ``student`` /
``teacher`` apply closures, and returns (scalar loss, metrics dict).
Everything is traced once per loss_type (static dispatch) — no Python
branching at step time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# teacher-need predicate (mm/trainer_utils.py:5-9)
LOSSES_WITH_TEACHER = ("DPO", "SCRUB", "RMU", "LLMU", "SKU", "NPO")
RMU_LAYER = 7  # reference: model.language_model.model.layers[7] (mm/trainer.py:305)


def loss_needs_teacher(loss_type: str) -> bool:
    return "KL" in loss_type or loss_type.upper() in LOSSES_WITH_TEACHER


def batch_return_pairs(loss_type: str) -> tuple[str, ...]:
    """Which batch splits the loss consumes (mm/dataset.py:205-212)."""
    lt = loss_type.upper()
    if lt in ("DPO", "LLMU"):
        return ("forget", "retain", "idk")
    if lt == "IDK":
        return ("idk", "retain")
    if lt == "SKU":
        return ("forget", "retain", "random")
    return ("forget", "retain")


# ---------------------------------------------------------------------------
# primitive loss pieces (torch-semantics)
# ---------------------------------------------------------------------------


def shift(logits, labels):
    return logits[:, :-1, :], labels[:, 1:]


def _token_nll(logits, labels):
    """Per-token NLL in lse form: never materializes a full fp32 softmax
    (the cast + reduce fuse in XLA — critical for 150k-vocab decoders)."""
    lg, lb = shift(logits, labels)
    valid = lb != -100
    lb_safe = jnp.where(valid, lb, 0)
    # promote — never demote — so bf16 logits get fp32 math while f64
    # parity runs (tests/test_reference_parity*.py) stay roundoff-exact
    lg32 = lg.astype(jnp.promote_types(lg.dtype, jnp.float32))
    lse = jax.scipy.special.logsumexp(lg32, axis=-1)
    ll = jnp.take_along_axis(lg32, lb_safe[..., None], axis=-1)[..., 0]
    nll = lse - ll
    return jnp.where(valid, nll, 0.0), valid


def ce_loss(logits, labels):
    """HF ``outputs.loss``: mean CE over valid shifted positions."""
    nll, valid = _token_nll(logits, labels)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def seq_sum_ce(logits, labels):
    """get_batch_loss: per-sequence summed CE, ignore -100 → [B]."""
    nll, _ = _token_nll(logits, labels)
    return jnp.sum(nll, axis=-1)


def logits2logprobs(logits):
    """logits2probs(log=True): [B,S,V] → [B·S, V] log-softmax."""
    lp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    )
    return lp.reshape(-1, lp.shape[-1])


def logits2probs(logits):
    p = jax.nn.softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    )
    return p.reshape(-1, p.shape[-1])


def kl_div(input_logp, target_logp):
    """torch F.kl_div(..., reduction='batchmean', log_target=True)."""
    t = jnp.exp(target_logp)
    return jnp.sum(t * (target_logp - input_logp)) / input_logp.shape[0]


def mse(a, b):
    return jnp.mean((a - b) ** 2)


# ---------------------------------------------------------------------------
# the dispatch
# ---------------------------------------------------------------------------


def compute_forget_loss(
    loss_type: str,
    batch: dict,
    *,
    student,
    teacher=None,
    beta: float = 1.0,
    loss_args: dict | None = None,
    control_vec=None,
    dpo_fix: bool = False,
):
    """Returns (loss, metrics).

    ``student(split_batch, capture_layer=None)`` → {"logits", "captured"}
    with gradients; ``teacher`` the same under stop_gradient.
    """
    lt = loss_type.lower()
    loss_args = loss_args or {}
    metrics = {}

    def s_fwd(split, **kw):
        return student(batch[split], **kw)

    def t_fwd(split, **kw):
        out = teacher(batch[split], **kw)
        return jax.tree.map(
            lambda x: jax.lax.stop_gradient(x) if x is not None else None,
            out,
            is_leaf=lambda x: x is None,
        )

    if lt == "retain_ft":
        loss = ce_loss(s_fwd("retain")["logits"], batch["retain"]["labels"])

    elif lt == "grad_ascent":
        loss = -ce_loss(s_fwd("forget")["logits"], batch["forget"]["labels"])

    elif lt.startswith("grad_diff"):
        forget_logits = s_fwd("forget")["logits"]
        retain_logits = s_fwd("retain")["logits"]

        if "forget_ce" in lt:
            forget_loss = ce_loss(forget_logits, batch["forget"]["labels"])
        elif "forget_entropy" in lt:
            p = logits2probs(forget_logits)
            forget_loss = jnp.sum(p * jnp.log(p + 1e-30))
        elif "forget_kl" in lt:
            forget_loss = kl_div(
                logits2logprobs(forget_logits),
                logits2logprobs(t_fwd("forget")["logits"]),
            )
        else:
            raise ValueError(f"Invalid loss type on forget {loss_type}")

        if "retain_ce" in lt:
            retain_loss = ce_loss(retain_logits, batch["retain"]["labels"])
        elif "retain_kl" in lt:
            retain_loss = kl_div(
                logits2logprobs(retain_logits),
                logits2logprobs(t_fwd("retain")["logits"]),
            )
        else:
            raise ValueError(f"Invalid loss type on retain {loss_type}")

        metrics.update(forget_loss=forget_loss, retain_loss=retain_loss)
        loss = -beta * forget_loss + retain_loss

    elif lt == "scrub":
        forget_lp = logits2logprobs(s_fwd("forget")["logits"])
        oracle_forget_lp = logits2logprobs(t_fwd("forget")["logits"])
        # torch call order: kl_div(input=oracle, target=student) = KL(student‖oracle)
        kl_forget = kl_div(oracle_forget_lp, forget_lp)

        retain_logits = s_fwd("retain")["logits"]
        retain_lp = logits2logprobs(retain_logits)
        oracle_retain_lp = logits2logprobs(t_fwd("retain")["logits"])
        kl_retain = kl_div(oracle_retain_lp, retain_lp)
        retain_ce = ce_loss(retain_logits, batch["retain"]["labels"])

        metrics.update(kl_forget=kl_forget, kl_retain=kl_retain, retain_ce=retain_ce)
        loss = -beta * kl_forget + kl_retain + retain_ce

    elif lt == "kl":
        forget_loss = -ce_loss(s_fwd("forget")["logits"], batch["forget"]["labels"])
        retain_lp = logits2logprobs(s_fwd("retain")["logits"])
        oracle_retain_lp = logits2logprobs(t_fwd("retain")["logits"])
        retain_loss = kl_div(retain_lp, oracle_retain_lp)
        metrics.update(forget_loss=forget_loss, retain_loss=retain_loss)
        loss = forget_loss + retain_loss

    elif lt == "llmu":
        forget_loss = -ce_loss(s_fwd("forget")["logits"], batch["forget"]["labels"])
        random_loss = ce_loss(s_fwd("idk")["logits"], batch["idk"]["labels"])
        retain_lp = logits2logprobs(s_fwd("retain")["logits"])
        oracle_retain_lp = logits2logprobs(t_fwd("retain")["logits"])
        # torch call order: kl_div(input=oracle, target=student)
        retain_loss = kl_div(oracle_retain_lp, retain_lp)
        metrics.update(forget_loss=forget_loss, retain_loss=retain_loss, random_loss=random_loss)
        loss = forget_loss + retain_loss + random_loss

    elif lt == "rmu":
        assert control_vec is not None, "RMU needs a control vector (see make_control_vec)"
        forget_acts = s_fwd("forget", capture_layer=RMU_LAYER)["captured"]
        if loss_args.get("rmu_nlp"):
            # NLP-trainer variant (nlp/dataloader.py:333-358): mse over the
            # RAW [B,S,H] activations (no seq mean) against a (1,1,H)
            # control vector — unlike the MM trainer's mean(dim=1) form below
            forget_loss = mse(forget_acts, control_vec) * beta
        else:
            forget_loss = mse(jnp.mean(forget_acts, axis=1), control_vec) * beta
        retain_acts = s_fwd("retain", capture_layer=RMU_LAYER)["captured"]
        oracle_retain_acts = t_fwd("retain", capture_layer=RMU_LAYER)["captured"]
        retain_loss = mse(retain_acts, oracle_retain_acts)
        metrics.update(forget_loss=forget_loss, retain_loss=retain_loss)
        loss = forget_loss + retain_loss

    elif lt == "npo":
        forget_p = logits2probs(s_fwd("forget")["logits"])
        oracle_forget_p = logits2probs(t_fwd("forget")["logits"])
        if loss_args.get("npo_nlp"):
            # NLP-trainer variant (nlp/dataloader.py:383-400): the POWER is
            # applied to the LOG prob-ratio (no epsilon) — numerically
            # fragile exactly like the reference (negative log-ratios under a
            # fractional beta → NaN), kept faithfully
            pi_ratios = jnp.log(forget_p / oracle_forget_p)
        else:
            # MM-trainer form (mm/trainer.py:343-353): ratio**beta, +1e-8
            pi_ratios = forget_p / (oracle_forget_p + 1e-8)
        loss = (2.0 / beta) * jnp.mean(jnp.log1p(pi_ratios**beta))

    elif lt == "idk":
        retain_loss = ce_loss(s_fwd("retain")["logits"], batch["retain"]["labels"])
        idk_loss = ce_loss(s_fwd("idk")["logits"], batch["idk"]["labels"])
        metrics.update(retain_loss=retain_loss, idk_loss=idk_loss)
        loss = retain_loss + idk_loss

    elif lt == "eco_ft":
        forget_loss = ce_loss(s_fwd("forget")["logits"], batch["forget"]["labels"])
        retain_loss = ce_loss(s_fwd("retain")["logits"], batch["retain"]["labels"])
        metrics.update(forget_loss=forget_loss, retain_loss=retain_loss)
        loss = beta * forget_loss + retain_loss

    elif lt == "dpo":
        idk_logits = s_fwd("idk")["logits"]
        forget_logits = s_fwd("forget")["logits"]
        idk_logits_o = t_fwd("idk")["logits"]
        forget_logits_o = t_fwd("forget")["logits"]

        idk_lp = -seq_sum_ce(idk_logits, batch["idk"]["labels"])
        forget_lp = -seq_sum_ce(forget_logits, batch["forget"]["labels"])
        idk_lp_o = -seq_sum_ce(idk_logits_o, batch["idk"]["labels"])
        forget_lp_o = -seq_sum_ce(forget_logits_o, batch["forget"]["labels"])

        pi_logratios = idk_lp - forget_lp
        ref_logratios = idk_lp_o - forget_lp_o
        dpo_beta = 0.1
        true_dpo = -jnp.mean(jax.nn.log_sigmoid(dpo_beta * (pi_logratios - ref_logratios)))
        metrics.update(true_dpo_loss=true_dpo, pi_logratios=jnp.mean(pi_logratios))
        # reference overwrites to −mean(idk sequence logprob) (mm/trainer.py:394-396)
        loss = true_dpo if dpo_fix else -jnp.mean(idk_lp)

    elif lt == "sku":
        bad_loss = ce_loss(s_fwd("forget")["logits"], batch["forget"]["labels"])
        # random: [B, K, ...] → K forwards (mm/trainer.py:420-429)
        rnd = batch["random"]
        K = rnd["input_ids"].shape[1]
        random_loss = 0.0
        for i in range(K):
            sub = {k: v[:, i] for k, v in rnd.items()}
            random_loss = random_loss + ce_loss(student(sub)["logits"], sub["labels"])
        retain_lp = logits2logprobs(s_fwd("retain")["logits"])
        teacher_retain_lp = logits2logprobs(t_fwd("retain")["logits"])
        normal_loss = -kl_div(retain_lp, teacher_retain_lp)
        metrics.update(bad_loss=bad_loss, random_loss=random_loss, normal_loss=normal_loss)
        loss = (
            loss_args.get("bad_weight", 2.5) * bad_loss
            + loss_args.get("random_weight", 1.0) * random_loss
            + loss_args.get("normal_weight", 0.5) * normal_loss
        )

    else:
        raise ValueError(f"Invalid loss type {loss_type}")

    metrics["loss"] = loss
    return loss, metrics


def make_control_vec(key, batch_size: int, hidden_size: int, norm: float = 300.0):
    """RMU steering vector: rand[B,1,H] scaled to global norm 300
    (mm/trainer.py:313-317; torch.rand is uniform[0,1))."""
    v = jax.random.uniform(key, (batch_size, 1, hidden_size), jnp.float32)
    return v / jnp.linalg.norm(v) * norm


def l_regularization(
    trainable_flat, init_flat=None, *, l1_lambda: float = 0.0, l0_lambda: float = 0.0
):
    """L1/L0 over trainable params or their delta from init
    (mm/trainer.py:451-481).  L0 (count of non-zeros) has zero gradient a.e.;
    like torch, it contributes value but no grad."""
    delta = (
        trainable_flat
        if init_flat is None
        else jax.tree.map(lambda a, b: a - b, trainable_flat, init_flat)
    )
    leaves = [
        x.reshape(-1).astype(jnp.promote_types(x.dtype, jnp.float32))
        for x in jax.tree.leaves(delta)
    ]
    if not leaves:
        return 0.0
    flat = jnp.concatenate(leaves)
    reg = 0.0
    if l1_lambda:
        # x·sign(x) == |x| in value but carries torch's L1 subgradient:
        # sign(x) with sign(0) = 0 (jnp.abs would give d|0| = 1, which
        # diverges from torch exactly on the zero deltas — e.g. layernorm
        # weights identical between student and oracle)
        reg = reg + l1_lambda * jnp.sum(flat * jnp.sign(flat))
    if l0_lambda:
        reg = reg + l0_lambda * jnp.sum((flat != 0).astype(jnp.float32))
    return reg
