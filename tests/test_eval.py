"""Evaluation-engine tests: KV-cache generation parity, truth-ratio math,
metric-layer golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.distance import jensenshannon
from scipy.stats import hmean, ks_2samp

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.evaluation import metrics
from multimodal_unlearning_tpu.evaluation.evaluator import eval_perturbation_ratio
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
from multimodal_unlearning_tpu.models import llama


def tiny_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def reference_greedy(params, cfg, input_ids, attention_mask, n_new):
    """No-cache greedy loop: full forward each step."""
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)
    out_tokens = []
    for _ in range(n_new):
        logits = llama.forward(
            params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            compute_dtype=jnp.float32,
        )["logits"]
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        out_tokens.append(nxt)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
        mask = np.concatenate([mask, np.ones((ids.shape[0], 1), mask.dtype)], axis=1)
    return np.stack(out_tokens, axis=1)


def test_greedy_generate_matches_no_cache_loop():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(0)
    B, S = 3, 12
    ids = rng.integers(3, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    # left padding on two rows
    ids[0, :5] = 0
    mask[0, :5] = 0
    ids[1, :2] = 0
    mask[1, :2] = 0

    want = reference_greedy(params, cfg, ids, mask, 6)
    got = greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=6, pad_token_id=0, cache_dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_greedy_generate_eos_padding():
    cfg, params = tiny_decoder()
    rng = np.random.default_rng(1)
    ids = rng.integers(3, cfg.vocab_size, (2, 8))
    mask = np.ones((2, 8), np.int64)
    want = reference_greedy(params, cfg, ids, mask, 8)
    # pick the token the model emits at step 3 of row 0 as "eos"
    eos = int(want[0, 3])
    got = np.asarray(
        greedy_generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=8, pad_token_id=0, eos_token_id=eos,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
    )
    row = got[0]
    hits = np.where(want[0] == eos)[0]
    first = hits[0]
    # tokens before eos match; at-and-after eos only pads
    np.testing.assert_array_equal(row[:first], want[0][:first])
    assert (row[first:] == 0).all()


def test_eval_perturbation_ratio_math():
    """Truth ratio = exp(gt/token − mean(perturb/token)) with the reference's
    unshifted-label token counts."""
    V = 7

    def apply_fn(batch):
        # deterministic logits: strongly prefer token (label+1) % V → fixed loss
        ids = np.asarray(batch["input_ids"])
        B, S = ids.shape
        logits = np.zeros((B, S, V), np.float32)
        return {"logits": jnp.asarray(logits)}  # uniform → loss = log V per token

    base_batch = {
        "input_ids": np.ones((2, 5), np.int32),
        "labels": np.array([[-100, 1, 2, 3, -100], [-100, -100, 1, 2, 3]]),
        "indices": np.array([0, 1]),
    }
    pb = {
        "input_ids": np.ones((2, 2, 5), np.int32),
        "labels": np.stack([base_batch["labels"]] * 2, axis=1),
        "indices": np.array([0, 1]),
    }
    logs = eval_perturbation_ratio([base_batch], [pb], apply_fn)
    # uniform logits → per-token loss log(V) on every valid shifted position
    n_valid_shift = [3, 3]  # row0: labels[1:] has 3 valid; row1: 3 valid
    n_unshifted = [3, 3]
    for i in range(2):
        want_loss = np.log(V) * n_valid_shift[i] / n_unshifted[i]
        assert logs["avg_paraphrased_loss"][i] == pytest.approx(want_loss, rel=1e-5)
        assert logs["truth_ratio"][i] == pytest.approx(1.0, rel=1e-5)  # same loss both sides


def make_task(rng, n=40, forget=False):
    return {
        "avg_gt_loss": {str(i): float(rng.uniform(0.5, 2.0)) for i in range(n)},
        "avg_paraphrased_loss": {str(i): float(rng.uniform(0.5, 2.0)) for i in range(n)},
        "average_perturb_loss": {str(i): [float(rng.uniform(0.5, 2.0)) for _ in range(3)] for i in range(n)},
        "rougeL_recall": {str(i): float(rng.uniform(0, 1)) for i in range(n)},
        "rouge1_recall": {str(i): float(rng.uniform(0, 1)) for i in range(n)},
        "generated_text": {str(i): ["q", "gen text", "true text"] for i in range(n)},
    }


def test_mm_model_utility_and_forget_quality_formulas():
    rng = np.random.default_rng(0)
    results = {
        "eval_real_faces_wo_options.json": make_task(rng),
        "eval_real_world_wo_options.json": make_task(rng),
        "eval_log.json": make_task(rng),
        "eval_log_forget.json": make_task(rng, forget=True),
    }
    agg = metrics.compute_model_utility(results)
    # manual check of one task
    t = results["eval_log.json"]
    want_prob = np.mean(np.exp(-np.array(list(t["avg_gt_loss"].values()))))
    assert agg["Prob. Retain"] == pytest.approx(want_prob, rel=1e-8)
    para = np.array(list(t["avg_paraphrased_loss"].values()))
    pert = np.array([np.mean(v) for v in t["average_perturb_loss"].values()]).mean()
    tr = np.exp(pert - para)
    assert agg["Truth Ratio Retain"] == pytest.approx(np.mean(np.maximum(0, 1 - 1 / tr)), rel=1e-8)
    non_forget = [v for k, v in agg.items() if "Forget" not in k and k != "Model Utility"]
    assert agg["Model Utility"] == pytest.approx(hmean(non_forget), rel=1e-8)

    retain_results = {"eval_log_forget.json": make_task(rng)}
    fq = metrics.evaluate_forget_quality(results, retain_results)
    u = results["eval_log_forget.json"]
    r = retain_results["eval_log_forget.json"]
    u_tr = np.exp(
        np.array([np.mean(v) for v in u["average_perturb_loss"].values()]).mean()
        - np.array(list(u["avg_paraphrased_loss"].values()))
    )
    r_tr = np.exp(
        np.array([np.mean(v) for v in r["average_perturb_loss"].values()]).mean()
        - np.array(list(r["avg_paraphrased_loss"].values()))
    )
    assert fq["KS test p-value"] == pytest.approx(ks_2samp(u_tr, r_tr).pvalue, rel=1e-8)
    assert fq["JS metric"] == pytest.approx(jensenshannon(u_tr, r_tr), rel=1e-8)
    assert metrics.forget_quality_table_variant(results, retain_results) == pytest.approx(
        1 - fq["JS metric"], rel=1e-8
    )


def test_tofu_model_utility_per_sample_truth_ratio():
    rng = np.random.default_rng(1)
    results = {
        "eval_real_author_wo_options.json": make_task(rng),
        "eval_real_world_wo_options.json": make_task(rng),
        "eval_log.json": make_task(rng),
        "eval_log_forget.json": make_task(rng),
    }
    out = metrics.get_model_utility(results)
    t = results["eval_log.json"]
    para = np.exp(-np.array(list(t["avg_paraphrased_loss"].values())))
    pert = np.exp(-np.array([v for v in t["average_perturb_loss"].values()])).mean(-1)
    stat = pert / para
    assert out["Retain Truth Ratio"] == pytest.approx(np.mean(np.maximum(0, 1 - stat)), rel=1e-8)

    fq = metrics.get_forget_quality(results, {"eval_log_forget.json": make_task(rng)})
    assert 0 <= fq["Forget Quality"] <= 1


def test_interleave_repair():
    a = list(range(8))
    b = list(range(100, 108))
    out = metrics.interleave(a, b, 2)
    assert out[:6] == [0, 1, 100, 101, 2, 3]
    d = metrics.merge_dicts({"x": {"a": 1}}, {"x": {"b": 2}, "y": 3})
    assert d == {"x": {"a": 1, "b": 2}, "y": 3}

    # the halve-and-interleave repair is 2-process-only: any other count
    # would silently mis-assemble, so it must refuse
    with pytest.raises(ValueError, match="2-process"):
        metrics.interleave_eval_result_dict({}, "forget10", 8, num_processes=4)
