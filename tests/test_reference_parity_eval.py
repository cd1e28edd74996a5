"""Differential EVAL parity vs the installed torch reference.

Drives the reference's actual eval engine (/root/reference/mm/eval.py
get_all_evals + eval_perturbation_ratio) and this framework's
evaluation/evaluator.py on the SAME model weights (bridged) and the SAME
batches, then diffs every per-sample JSON field — and feeds both outputs
through BOTH metrics calculators to close the loop on BASELINE.json's
"MU/FQ within ±1% of reference".

Text-only operating point: the reference's remove_image_tokens
(mm/trainer_utils.py:48-70) presumes non-expanded image ids (pre-4.44
transformers); on text rows it is the identity, so both conventions coincide
— see tests/ref_parity_common.py.
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.data.tokenizer import ByteTokenizer
from multimodal_unlearning_tpu.evaluation import evaluator as ours_eval
from multimodal_unlearning_tpu.evaluation import metrics as ours_metrics
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate, pad_prompts

from tests.ref_parity_common import (
    ByteTokHF,
    RefModelShim,
    bridge_params,
    build_hf_llava,
    collate_perturbed_rows,
    collate_text_rows,
    load_ref_module,
    make_eval_rows,
    ours_config,
    to_torch_batches,
)

MAX_NEW = 8
N_ROWS = 8
BS = 4


@pytest.fixture(scope="module")
def setup():
    # float64 on BOTH sides: a random-init model's logit gaps (~1e-2) sit too
    # close to cross-implementation f32 noise (~3e-3) for greedy argmax to be
    # tie-stable; f64 noise (~1e-7 through the shared f32 rms-norm bottleneck)
    # makes token-exact comparison sound
    hf = build_hf_llava(seed=3).double()
    cfg = ours_config()
    with jax.enable_x64(True):
        params = bridge_params(hf, dtype=np.float64)
    bt = ByteTokenizer(vocab_size=256)
    rng = np.random.default_rng(7)
    rows = make_eval_rows(rng, N_ROWS)
    return dict(hf=hf, cfg=cfg, params=params, bt=bt, rows=rows)


def _batches(bt, rows, answer_key, bs):
    return [
        collate_text_rows(bt, rows[i : i + bs], answer_key)
        for i in range(0, len(rows), bs)
    ]


def _pert_batches(bt, rows, bs):
    return [
        collate_perturbed_rows(bt, rows[i : i + bs]) for i in range(0, len(rows), bs)
    ]


def _run_reference(setup, task):
    ref_eval = load_ref_module("mm.eval")
    bt, rows = setup["bt"], setup["rows"]
    eval_b = to_torch_batches(
        _batches(bt, rows, "answer", BS),
        keep=("input_ids", "attention_mask", "labels", "indices", "answers"),
    )
    base_b = to_torch_batches(_batches(bt, rows, "paraphrased_answer", BS))
    pert_b = to_torch_batches(_pert_batches(bt, rows, BS))
    cfg_stub = types.SimpleNamespace(generation=types.SimpleNamespace(max_new_tokens=MAX_NEW))
    shim = RefModelShim(setup["hf"])
    proc = ByteTokHF(bt)
    return ref_eval.get_all_evals(cfg_stub, shim, proc, task, eval_b, base_b, pert_b)


def _run_ours(setup, task):
    bt, rows, cfg, params = setup["bt"], setup["rows"], setup["cfg"], setup["params"]

    def apply_fn(batch):
        out_logits = _forward(params, cfg, batch)
        return {"logits": out_logits}

    def _forward(p, cfg, batch):
        from multimodal_unlearning_tpu.models import llava

        return llava.forward(
            p, cfg, jnp.asarray(batch["input_ids"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            compute_dtype=jnp.float64,
        )["logits"]

    def generate_fn(batch, max_new_tokens):
        gen = greedy_generate(
            params, cfg, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            max_new_tokens=max_new_tokens,
            pad_token_id=bt.pad_token_id, eos_token_id=bt.eos_token_id,
            pixel_values=None, is_vlm=True,
            compute_dtype=jnp.float64, cache_dtype=jnp.float64,
        )
        return [bt.decode(row, skip_special_tokens=True) for row in np.asarray(gen)]

    proc = types.SimpleNamespace(tokenizer=bt)
    with jax.enable_x64(True):
        return ours_eval.get_all_evals(
            task,
            _batches(bt, rows, "answer", BS),
            _batches(bt, rows, "paraphrased_answer", BS),
            _pert_batches(bt, rows, BS),
            apply_fn=apply_fn, generate_fn=generate_fn, processor=proc,
            max_new_tokens=MAX_NEW,
        )


NUMERIC_FIELDS = (
    "avg_gt_loss", "gt_loss", "num_token_gt",
    "avg_paraphrased_loss", "average_perturb_loss", "truth_ratio",
    "paraphrased_loss", "perturb_loss", "num_token_paraphrased",
    "num_token_perturb", "rouge1_recall", "rougeL_recall", "normalized_gt_loss",
)


@pytest.fixture(scope="module")
def both_logs(setup):
    task = "eval_log_forget"
    ref_logs = _run_reference(setup, task)
    our_logs = _run_ours(setup, task)
    return ref_logs, our_logs


def test_eval_per_sample_fields_match_reference(both_logs):
    ref_logs, our_logs = both_logs
    assert set(map(str, ref_logs.keys())) == set(map(str, our_logs.keys()))
    for field in NUMERIC_FIELDS:
        if field not in ref_logs:
            continue
        ref_d, our_d = ref_logs[field], our_logs[field]
        if field in ("rouge1_recall", "rougeL_recall"):
            # reference quirk: mm/eval.py:104 never appends to all_indices, so
            # its in-eval ROUGE dicts come out EMPTY and the metrics layer
            # recomputes them from generated_text (mm/calculate_metrics.py:107)
            # — ours fills them directly (evaluator.py docstring); with
            # token-exact generations the downstream recompute coincides,
            # which test_mm_metrics_match_reference pins.
            assert len(ref_d) == 0 and len(our_d) == len(our_logs["avg_gt_loss"])
            continue
        assert set(map(int, ref_d)) == set(map(int, our_d)), field
        for idx in ref_d:
            r = np.asarray(ref_d[idx], np.float64)
            o = np.asarray(our_d[int(idx)], np.float64)
            np.testing.assert_allclose(o, r, rtol=5e-4, atol=5e-5, err_msg=f"{field}[{idx}]")


def test_eval_generations_match_reference(both_logs):
    """Greedy decodes must token-match: HF generate vs our fused decode."""
    ref_logs, our_logs = both_logs
    ref_g, our_g = ref_logs["generated_text"], our_logs["generated_text"]
    for idx in ref_g:
        rq, rgen, rans = ref_g[idx][:3]
        oq, ogen, oans = our_g[int(idx)][:3]
        assert ogen == rgen, f"idx {idx}: ours {ogen!r} vs reference {rgen!r}"
        assert oans == rans
        assert oq == rq


def test_mu_fq_within_reference_tolerance(both_logs):
    """BASELINE.json target: MU/FQ within ±1% of reference.  Both engines'
    logs through BOTH calculators — all four readings must agree."""
    import copy

    ref_calc = load_ref_module("mm.calculate_metrics")
    ref_logs, our_logs = both_logs

    def with_retain_keys(logs):
        # compute_model_utility needs non-forget tasks too; reuse the same
        # logs under retain-task filenames (identical data → valid MU compare)
        return {
            "eval_log.json": copy.deepcopy(dict(logs)),
            "eval_log_forget.json": copy.deepcopy(dict(logs)),
        }

    ref_agg = with_retain_keys(ref_logs)
    our_agg = with_retain_keys(our_logs)

    mu_rr = ref_calc.compute_model_utility(copy.deepcopy(ref_agg))
    mu_oo = ours_metrics.compute_model_utility(copy.deepcopy(our_agg))
    mu_ro = ref_calc.compute_model_utility(copy.deepcopy(our_agg))
    # per-factor, not just the hmean: on a random-init model ROUGE is 0 and
    # collapses Model Utility to a trivial 0==0 — Prob./Truth Ratio are the
    # nonzero, informative factors and must agree within ±1%
    assert any(float(v) > 0 for k, v in mu_rr.items() if k != "Model Utility")
    for k, rv in mu_rr.items():
        assert float(mu_oo[k]) == pytest.approx(float(rv), rel=1e-2, abs=1e-12), k
        assert float(mu_ro[k]) == pytest.approx(float(rv), rel=1e-2, abs=1e-12), k

    fq_rr = ref_calc.evaluate_forget_quality(copy.deepcopy(ref_agg), copy.deepcopy(ref_agg))
    fq_oo = ours_metrics.evaluate_forget_quality(copy.deepcopy(our_agg), copy.deepcopy(our_agg))
    # both self-comparisons: identical distributions → p-value 1 exactly
    assert fq_oo["KS test p-value"] == pytest.approx(fq_rr["KS test p-value"], rel=1e-2)
    # cross: our logs vs reference logs — distributions differ only by fp
    # noise, KS p-value must stay at 1.0 (no detectable shift)
    fq_cross = ref_calc.evaluate_forget_quality(copy.deepcopy(our_agg), copy.deepcopy(ref_agg))
    assert fq_cross["KS test p-value"] > 0.99
