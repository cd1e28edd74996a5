"""Metrics/aggregation layer: Model Utility, Forget Quality, truth ratios.

Bit-faithful re-implementation of both metric stacks:
- the shared TOFU-style stack (reference utils.py:123-198) used by nlp;
- the mm calculator (mm/calculate_metrics.py:51-128) with its task map and
  the 1−JS table variant (mm/build_vllm_table.py:103);
- the legacy 2-process interleave repair (utils.py:94-120).
"""

from __future__ import annotations

import copy

import numpy as np
from scipy.spatial.distance import jensenshannon
from scipy.stats import hmean, ks_2samp

from multimodal_unlearning_tpu.evaluation.evaluator import eval_rouge_recall


def _vals(d: dict):
    return np.array(list(d.values()))


# ---------------------------------------------------------------------------
# mm flavor (mm/calculate_metrics.py)
# ---------------------------------------------------------------------------

FILE_TO_TASK = {
    "eval_real_faces_wo_options.json": "Real Faces",
    "eval_real_world_wo_options.json": "Real World",
    "eval_log.json": "Retain",
    "eval_retain_facerec.json": "Retain FaceRec",
    "eval_log_forget.json": "Forget",
    "eval_forget_facerec.json": "Forget FaceRec",
}

METRIC_NAMES = ("ROUGE", "Prob.", "Truth Ratio")


def evaluate_forget_quality(unlearned_data: dict, retained_data: dict) -> dict:
    """KS-2samp p-value + JS metric over truth-ratio distributions
    (mm/calculate_metrics.py:51-72 — note the scalar-mean perturb loss)."""
    u = unlearned_data["eval_log_forget.json"]
    r = retained_data["eval_log_forget.json"]
    u_para = _vals(u["avg_paraphrased_loss"])
    u_pert = _vals(u["average_perturb_loss"]).mean()
    r_para = _vals(r["avg_paraphrased_loss"])
    r_pert = _vals(r["average_perturb_loss"]).mean()
    u_tr = np.exp(u_pert - u_para)
    r_tr = np.exp(r_pert - r_para)
    return {
        "KS test p-value": ks_2samp(u_tr, r_tr).pvalue,
        "JS metric": jensenshannon(u_tr, r_tr),
    }


def compute_model_utility(eval_results: dict) -> dict:
    """mm/calculate_metrics.py:88-128."""
    agg = {}
    for task_file, res in eval_results.items():
        task = FILE_TO_TASK[task_file]

        true_probs = np.exp(-_vals(res["avg_gt_loss"]))
        if "eval_log" in task_file:
            avg_gt_prob = np.mean(true_probs)
        else:
            false_probs = np.exp(-_vals(res["average_perturb_loss"]))
            combined = np.concatenate(
                [np.expand_dims(true_probs, -1), false_probs], axis=1
            ).sum(-1)
            avg_gt_prob = np.mean(true_probs / combined)
        agg[f"Prob. {task}"] = avg_gt_prob

        if len(res.get("rougeL_recall", [])) == 0:
            res.update(
                eval_rouge_recall(
                    [g for _, g, _ in res["generated_text"].values()],
                    [a for _, _, a in res["generated_text"].values()],
                    list(res["generated_text"].keys()),
                )
            )
        agg[f"ROUGE {task}"] = _vals(res["rougeL_recall"]).mean()

        para = _vals(res["avg_paraphrased_loss"])
        pert = _vals(res["average_perturb_loss"]).mean()
        tr = np.exp(pert - para)
        if "forget" in task_file:
            agg[f"Truth Ratio {task}"] = np.mean(np.minimum(tr, 1 / tr))
        else:
            agg[f"Truth Ratio {task}"] = np.mean(np.maximum(0, 1 - 1 / tr))

    agg["Model Utility"] = hmean([v for k, v in agg.items() if "Forget" not in k])
    return agg


def forget_quality_table_variant(unlearned_data: dict, retained_data: dict) -> float:
    """1 − JS (mm/build_vllm_table.py:103)."""
    return 1.0 - evaluate_forget_quality(unlearned_data, retained_data)["JS metric"]


# ---------------------------------------------------------------------------
# TOFU flavor (utils.py — used by the nlp stack)
# ---------------------------------------------------------------------------

TOFU_TASK_DICT = {
    "eval_real_author_wo_options.json": "Real Authors",
    "eval_real_world_wo_options.json": "Real World",
    "eval_log.json": "Retain",
    "eval_log_forget.json": "Forget",
}


def get_model_utility(eval_result_dict: dict) -> dict:
    """utils.py:123-179 (per-sample truth ratios, unlike the mm variant)."""
    output = {}
    for k, res in eval_result_dict.items():
        task = TOFU_TASK_DICT[k]
        if "eval_log" in k:
            gt_probs = np.exp(-_vals(res["avg_gt_loss"]))
            avg_gt_prob = np.mean(gt_probs)
        else:
            true_p = np.exp(-_vals(res["avg_gt_loss"]))
            false_p = np.exp(-_vals(res["average_perturb_loss"]))
            all_p = np.concatenate([np.expand_dims(true_p, -1), false_p], axis=1).sum(-1)
            avg_gt_prob = np.mean(true_p / all_p)
        output[f"{task} Probability"] = avg_gt_prob

        output[f"{task} ROUGE"] = _vals(res["rougeL_recall"]).mean()

        idxs = list(res["avg_paraphrased_loss"].keys())
        para = np.exp(-np.array([res["avg_paraphrased_loss"][i] for i in idxs]))
        pert = np.exp(-np.array([res["average_perturb_loss"][i] for i in idxs])).mean(-1)
        stat = pert / para
        if "forget" in k:
            output[f"{task} Truth Ratio"] = np.mean(np.minimum(stat, 1 / stat))
        else:
            output[f"{task} Truth Ratio"] = np.mean(np.maximum(0, 1 - stat))

    cands = [v for k, v in output.items() if "Forget" not in k]
    output["Model Utility"] = hmean(cands)
    return output


def nlp_get_model_utility(eval_result_dict: dict) -> dict:
    """nlp/aggregate_eval_stat.py:40-91 — the NLP aggregator CLI's OWN
    Model-Utility variant, distinct from the shared TOFU copy above
    (utils.py:123-179, which nothing in the reference actually calls):

    - keys are ``"Prob. {task}"`` / ``"ROUGE {task}"`` / ``"Truth Ratio
      {task}"`` (the shared copy uses ``"{task} Probability"`` …);
    - the truth-ratio statistic is ``exp(mean perturbed LOSS − paraphrase
      loss)`` — exp of the mean loss gap — where the shared copy takes the
      MEAN of per-answer probability ratios (mean of exps ≠ exp of mean);
    - the non-forget clamp is ``max(0, 1 − 1/stat)`` vs ``max(0, 1 − stat)``.

    Key order (ROUGE, Prob., Truth Ratio per task, then Model Utility)
    reproduces the reference's init-then-overwrite dict so the CSV columns
    match."""
    metrics_names = ["ROUGE", "Prob.", "Truth Ratio"]
    output = {}
    for k in TOFU_TASK_DICT:
        for m in metrics_names:
            output[m + " " + TOFU_TASK_DICT[k]] = []

    for k, res in eval_result_dict.items():
        task = TOFU_TASK_DICT[k]
        if "eval_log" in k:
            avg_gt_prob = np.mean(np.exp(-_vals(res["avg_gt_loss"])))
        else:
            true_p = np.exp(-_vals(res["avg_gt_loss"]))
            false_p = np.exp(-_vals(res["average_perturb_loss"]))
            all_p = np.concatenate([np.expand_dims(true_p, -1), false_p], axis=1).sum(-1)
            avg_gt_prob = np.mean(true_p / all_p)
        output[f"Prob. {task}"] = avg_gt_prob

        output[f"ROUGE {task}"] = _vals(res["rougeL_recall"]).mean()

        para_loss = _vals(res["avg_paraphrased_loss"])
        pert_loss = _vals(res["average_perturb_loss"]).mean(-1)
        stat = np.exp(pert_loss - para_loss)
        if "forget" in k:
            output[f"Truth Ratio {task}"] = np.mean(np.minimum(stat, 1 / stat))
        else:
            output[f"Truth Ratio {task}"] = np.mean(np.maximum(0, 1 - 1 / stat))

    cands = [v for k, v in output.items() if "Forget" not in k]
    output["Model Utility"] = hmean(cands)
    return output


def get_forget_quality(unlearn_result: dict, retain_result: dict) -> dict:
    """utils.py:182-198 (per-sample mean over perturbed answers)."""
    u = unlearn_result["eval_log_forget.json"]
    r = retain_result["eval_log_forget.json"]
    u_para = _vals(u["avg_paraphrased_loss"])
    u_pert = _vals(u["average_perturb_loss"]).mean(axis=-1)
    r_para = _vals(r["avg_paraphrased_loss"])
    r_pert = _vals(r["average_perturb_loss"]).mean(axis=-1)
    u_tr = np.exp(u_pert - u_para)
    r_tr = np.exp(r_pert - r_para)
    res = ks_2samp(u_tr, r_tr)
    return {
        "Forget Quality": res.pvalue,
        "KS Test PVal Forget": res.pvalue,
        "KS Test Forget": res.statistic,
    }


# ---------------------------------------------------------------------------
# Multi-process interleave repair (utils.py:57-120)
# ---------------------------------------------------------------------------


def _natsorted(keys):
    """Natural-order sort (natsort is not in the image; same semantics for
    the digit-grouped keys this code sees)."""
    import re

    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", str(s))]

    return sorted(keys, key=key)


def merge_dicts(a: dict, b: dict) -> dict:
    """utils.py:57-75 (recursive, duplicate lists collapse, natsorted keys)."""
    natsorted = _natsorted
    out = copy.deepcopy(a)
    for key, value in b.items():
        if key in out:
            if isinstance(out[key], dict) and isinstance(value, dict):
                out[key] = merge_dicts(out[key], value)
            elif isinstance(out[key], list) and isinstance(value, list):
                pass  # duplicate lists: keep one
            else:
                out[key] = value
        else:
            out[key] = value
    return {k: out[k] for k in natsorted(out)}


def get_total_len(name: str, forget_rate: str) -> int:
    if name == "eval_real_author_wo_options.json":
        return 100
    if name == "eval_real_world_wo_options.json":
        return 117
    if name == "eval_log.json":
        return 300
    if forget_rate == "forget01":
        return 40
    if forget_rate == "forget05":
        return 200
    return 300


def interleave(a: list, b: list, size: int) -> list:
    assert len(a) == len(b) and size > 0
    c = []
    for i in range(0, len(a), size):
        c.extend(a[i : i + size])
        c.extend(b[i : i + size])
    return c


def interleave_eval_result_dict(eval_result_dict, forget_rate, large_bsz, num_processes=2):
    """utils.py:109-120 — 2-process-only legacy repair, kept for parity.

    The halve-and-interleave reconstruction is only correct for exactly two
    rank shards (the reference's own comment at utils.py:104-108); with any
    other process count it would silently mis-assemble the per-sample order,
    so refuse rather than corrupt.
    """
    if num_processes != 2:
        raise ValueError(
            f"interleave_eval_result_dict repairs exactly 2-process shards, got {num_processes}; "
            "merge per-rank eval logs by their saved indices instead"
        )
    small_bsz = large_bsz // 4
    for k, v in eval_result_dict.items():
        for metric, value in v.items():
            bsz = small_bsz if "perturb" in metric or "paraphrase" in metric else large_bsz
            total_len = get_total_len(k, forget_rate)
            a = value[0 : len(value) // 2]
            b = value[len(value) // 2 :]
            eval_result_dict[k][metric] = interleave(a, b, bsz)[:total_len]
    return eval_result_dict
