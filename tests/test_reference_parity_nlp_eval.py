"""Differential parity for the NLP EVAL engine vs the installed torch
reference (nlp/evaluate_util.py get_all_evals + eval_perturbation_ratio +
run_generation) and the NLP aggregator (nlp/aggregate_eval_stat.py).

The NLP engine differs from the MM one (tests/test_reference_parity_eval.py)
in prompt/ground-truth recovery: run_generation derives BOTH from the decoded
input split at the family split symbol (" [/INST]" for llama2-7b*, re-appended
to the prompt; "Answer: " otherwise, NOT re-appended) — the ROUGE ground
truth is the decoded text after the symbol, not the dataset answer column
(nlp/evaluate_util.py:146-170).  Our ``evaluator.nlp_get_all_evals`` pins
exactly this via the registry tags (empty answer_tag ⇒ instruction format).

Operating point: TOFU eos-right-pad convention
(nlp/data_module.py:convert_raw_data_to_model_format — eos pads with mask 0,
labels = -100 on the question span and all-but-one pad, ONE supervised eos),
"Question: …\\nAnswer: …" phi-style tags, float64 on both sides so greedy
argmax is tie-stable (see the mm eval parity header).
"""

from __future__ import annotations

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.data.tokenizer import ByteTokenizer
from multimodal_unlearning_tpu.evaluation import evaluator as ours_eval
from multimodal_unlearning_tpu.evaluation import metrics as ours_metrics
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate, pad_prompts

from tests.ref_parity_common import ByteTokHF, load_ref_module, make_eval_rows

MAX_NEW = 8
N_ROWS = 8
BS = 4
MAX_LEN = 96
N_LAYERS = 2
VOCAB = 256
HIDDEN = 64

TAGS = {"question_start_tag": "Question: ", "question_end_tag": "\n",
        "answer_tag": "Answer: "}


# ---------------------------------------------------------------------------
# TOFU-convention collation (nlp/data_module.py:10-43)
# ---------------------------------------------------------------------------


def _encode_row(bt, question, answer):
    new_q = TAGS["question_start_tag"] + question + TAGS["question_end_tag"]
    full = new_q + TAGS["answer_tag"] + answer
    nq = len(bt.encode(new_q, add_special_tokens=True))
    enc = bt.encode(full, add_special_tokens=True)[:MAX_LEN]
    pad = MAX_LEN - len(enc)
    ids = enc + [bt.eos_token_id] * pad
    if pad == 0:
        label = list(enc)
    else:
        label = enc + [bt.eos_token_id] + [-100] * (pad - 1)
    mask = [1] * len(enc) + [0] * pad
    label[:nq] = [-100] * nq
    return ids, label, mask


def _collate(bt, rows, answer_key):
    ids, labels, masks, answers = [], [], [], []
    for r in rows:
        i, l, m = _encode_row(bt, r["question"], r[answer_key])
        ids.append(i); labels.append(l); masks.append(m)
        answers.append(r[answer_key])
    return {
        "input_ids": np.asarray(ids, np.int64),
        "labels": np.asarray(labels, np.int64),
        "attention_mask": np.asarray(masks, np.int64),
        "indices": np.asarray([r["idx"] for r in rows], np.int64),
        "answers_text": answers,
    }


def _collate_perturbed(bt, rows):
    ids, labels, masks = [], [], []
    for r in rows:
        pi, pl, pm = [], [], []
        for ans in r["perturbed_answers"]:
            i, l, m = _encode_row(bt, r["question"], ans)
            pi.append(i); pl.append(l); pm.append(m)
        ids.append(pi); labels.append(pl); masks.append(pm)
    return {
        "input_ids": np.asarray(ids, np.int64),
        "labels": np.asarray(labels, np.int64),
        "attention_mask": np.asarray(masks, np.int64),
        "indices": np.asarray([r["idx"] for r in rows], np.int64),
    }


def _batches(bt, rows, answer_key):
    return [_collate(bt, rows[i:i + BS], answer_key) for i in range(0, len(rows), BS)]


def _pert_batches(bt, rows):
    return [_collate_perturbed(bt, rows[i:i + BS]) for i in range(0, len(rows), BS)]


def _to_ref_loader(batches):
    import torch

    return [
        (torch.tensor(b["input_ids"]), torch.tensor(b["labels"]),
         torch.tensor(b["attention_mask"]), torch.tensor(b["indices"]))
        for b in batches
    ]


# ---------------------------------------------------------------------------
# shared model + both runs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_unlearning_tpu.models import hf_bridge, llama

    cfg_hf = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
        num_hidden_layers=N_LAYERS, num_attention_heads=4,
        num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(4)
    hf = LlamaForCausalLM(cfg_hf).double().eval()
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    with jax.enable_x64(True):
        params = hf_bridge.llama_from_hf(sd, N_LAYERS, dtype=np.float64)
    ocfg = llama.LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
        num_layers=N_LAYERS, num_heads=4, num_kv_heads=2,
    )
    bt = ByteTokenizer(vocab_size=VOCAB)
    rows = make_eval_rows(np.random.default_rng(13), N_ROWS)
    return dict(hf=hf, params=params, ocfg=ocfg, bt=bt, rows=rows)


TASK = "eval_real_author_wo_options"  # non-eval_log → normalized_gt_loss on


def _run_reference(setup):
    ref_eval = load_ref_module("nlp.evaluate_util")
    bt, rows, hf = setup["bt"], setup["rows"], setup["hf"]
    eval_l = _to_ref_loader(_batches(bt, rows, "answer"))
    base_l = _to_ref_loader(_batches(bt, rows, "paraphrased_answer"))
    pert_l = _to_ref_loader(_pert_batches(bt, rows))
    cfg_stub = types.SimpleNamespace(
        model_family="phi",  # non-llama2 → "Answer: " rule
        generation=types.SimpleNamespace(max_length=MAX_LEN, max_new_tokens=MAX_NEW),
    )
    return ref_eval.get_all_evals(
        cfg_stub, hf, ByteTokHF(bt), TASK, eval_l, base_l, pert_l,
        normalize_gt=True,
    )


def _run_ours(setup):
    bt, rows, ocfg, params = setup["bt"], setup["rows"], setup["ocfg"], setup["params"]
    from multimodal_unlearning_tpu.models import llama

    def apply_fn(batch):
        logits = llama.forward(
            params, ocfg, jnp.asarray(batch["input_ids"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            compute_dtype=jnp.float64,
        )["logits"]
        return {"logits": logits}

    def generate_fn(q_texts):
        q_enc = [bt.encode(q, add_special_tokens=True) for q in q_texts]
        ids, mask = pad_prompts(q_enc, bt.pad_token_id)
        gen = greedy_generate(
            params, ocfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=MAX_NEW, pad_token_id=bt.pad_token_id,
            eos_token_id=bt.eos_token_id,
            compute_dtype=jnp.float64, cache_dtype=jnp.float64,
        )
        return [bt.decode(row, skip_special_tokens=True) for row in np.asarray(gen)]

    with jax.enable_x64(True):
        return ours_eval.nlp_get_all_evals(
            TASK,
            _batches(bt, rows, "answer"),
            _batches(bt, rows, "paraphrased_answer"),
            _pert_batches(bt, rows),
            apply_fn=apply_fn, generate_fn=generate_fn, tok=bt, tags=TAGS,
            normalize_gt=True,
        )


@pytest.fixture(scope="module")
def both_logs(setup):
    return _run_reference(setup), _run_ours(setup)


NUMERIC_FIELDS = (
    "avg_gt_loss", "gt_loss", "num_token_gt",
    "avg_paraphrased_loss", "average_perturb_loss", "truth_ratio",
    "paraphrased_loss", "perturb_loss", "num_token_paraphrased",
    "num_token_perturb", "rouge1_recall", "rougeL_recall",
    "normalized_gt_loss",
)


def test_nlp_eval_per_sample_fields_match_reference(both_logs):
    ref_logs, our_logs = both_logs
    assert set(map(str, ref_logs.keys())) == set(map(str, our_logs.keys()))
    for field in NUMERIC_FIELDS:
        assert field in ref_logs, field
        ref_d, our_d = ref_logs[field], our_logs[field]
        assert set(map(int, ref_d)) == set(map(int, our_d)), field
        for idx in ref_d:
            r = np.asarray(ref_d[idx], np.float64)
            o = np.asarray(our_d[int(idx)], np.float64)
            np.testing.assert_allclose(o, r, rtol=5e-4, atol=5e-5,
                                       err_msg=f"{field}[{idx}]")


def test_nlp_eval_generations_and_prompt_recovery_match(both_logs):
    """Token-exact greedy decodes AND the reference's split-symbol prompt/gt
    recovery: the prompt must NOT carry the answer tag (non-llama2 rule) and
    the ground truth must be the decoded-input split, not the raw answer."""
    ref_logs, our_logs = both_logs
    ref_g, our_g = ref_logs["generated_text"], our_logs["generated_text"]
    assert len(ref_g) == N_ROWS
    for idx in ref_g:
        rq, rgen, rans = ref_g[idx][:3]
        oq, ogen, oans = our_g[int(idx)][:3]
        assert ogen == rgen, f"idx {idx}: ours {ogen!r} vs reference {rgen!r}"
        assert oans == rans
        assert oq == rq
        # the non-llama2 rule: prompt ends at (and excludes) "Answer: "
        assert oq.endswith(TAGS["question_end_tag"])
        assert "Answer: " not in oq
    # non-vacuous ROUGE: the NLP engine (unlike mm's, whose all_indices stays
    # empty) fills its in-eval ROUGE dicts
    assert len(ref_logs["rouge1_recall"]) == N_ROWS


def test_nlp_aggregator_mu_fq_match_reference(both_logs):
    """Both logs through BOTH NLP aggregators (nlp/aggregate_eval_stat.py
    get_model_utility/get_forget_quality vs evaluation/metrics.py): every
    factor and the hmean within ±1%, KS p exactly comparable."""
    import copy

    ref_agg_mod = load_ref_module("nlp.aggregate_eval_stat")
    ref_logs, our_logs = both_logs

    def all_tasks(logs):
        return {
            "eval_real_author_wo_options.json": copy.deepcopy(dict(logs)),
            "eval_real_world_wo_options.json": copy.deepcopy(dict(logs)),
            "eval_log.json": copy.deepcopy(dict(logs)),
            "eval_log_forget.json": copy.deepcopy(dict(logs)),
        }

    mu_rr = ref_agg_mod.get_model_utility(all_tasks(ref_logs))
    mu_oo = ours_metrics.nlp_get_model_utility(all_tasks(our_logs))
    mu_ro = ref_agg_mod.get_model_utility(all_tasks(our_logs))
    assert list(mu_oo.keys()) == list(mu_rr.keys())  # CSV column parity
    assert any(float(v) > 0 for k, v in mu_rr.items() if k != "Model Utility")
    for k, rv in mu_rr.items():
        assert float(mu_oo[k]) == pytest.approx(float(rv), rel=1e-2, abs=1e-12), k
        assert float(mu_ro[k]) == pytest.approx(float(rv), rel=1e-2, abs=1e-12), k

    # non-vacuous: the aggregator's OWN truth-ratio formula (exp of the mean
    # loss gap, max(0, 1-1/stat)) genuinely differs from the shared TOFU
    # copy's (mean of prob ratios, max(0, 1-stat)) on the same logs
    mu_shared = ours_metrics.get_model_utility(all_tasks(our_logs))
    assert abs(float(mu_shared["Retain Truth Ratio"]) -
               float(mu_oo["Truth Ratio Retain"])) > 1e-6

    fq_rr = ref_agg_mod.get_forget_quality(all_tasks(ref_logs), all_tasks(ref_logs))
    fq_oo = ours_metrics.get_forget_quality(all_tasks(our_logs), all_tasks(our_logs))
    assert fq_oo["Forget Quality"] == pytest.approx(fq_rr["Forget Quality"], rel=1e-2)
    # cross: the two engines' truth-ratio DISTRIBUTIONS agree to fp noise
    # (sorted-value comparison — the KS statistic itself is a flaky proxy
    # here: pairwise-close samples interleave by 1-2 ecdf steps) and the KS
    # p-value detects no shift
    def forget_tr(logs):
        t = logs["eval_log_forget.json"]
        para = np.array([t["avg_paraphrased_loss"][i] for i in t["avg_paraphrased_loss"]])
        pert = np.array([t["average_perturb_loss"][i] for i in t["average_perturb_loss"]]).mean(-1)
        return np.sort(np.exp(pert - para))

    np.testing.assert_allclose(forget_tr(all_tasks(our_logs)),
                               forget_tr(all_tasks(ref_logs)), rtol=5e-4)
    fq_cross = ref_agg_mod.get_forget_quality(all_tasks(our_logs), all_tasks(ref_logs))
    assert fq_cross["Forget Quality"] > 0.9
