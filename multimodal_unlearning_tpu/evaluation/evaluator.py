"""Per-task evaluation: teacher-forced losses, truth ratios, generation, ROUGE.

Byte-compatible JSON schema with the reference eval engine (mm/eval.py):
per task → {average_perturb_loss, avg_paraphrased_loss, truth_ratio,
paraphrased_loss, perturb_loss, num_token_paraphrased, num_token_perturb,
avg_gt_loss, gt_loss, num_token_gt, generated_text, rouge1_recall,
rougeL_recall[, normalized_gt_loss]} keyed by dataset index, plus
``eval_log_aggregated.json``.

Reference quirks handled explicitly:
- generation re-tokenizes the decoded question *without images*
  (mm/eval.py:120-124) — replicated by default (``generate_with_images``
  flips it);
- the reference never fills ``all_indices`` so its in-eval ROUGE dicts are
  empty and get recomputed downstream (mm/eval.py:104,135-149,
  mm/calculate_metrics.py:107-108) — here they are filled correctly; the
  metrics layer recomputes from generated_text when absent either way.

Losses are ``get_batch_loss`` semantics (per-sequence summed CE over -100
masked labels).  Image-token logit removal is unnecessary: labels align with
the expanded sequence and image positions carry -100 (models/llava.py).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from rouge_score.rouge_scorer import RougeScorer

from multimodal_unlearning_tpu.train.losses import seq_sum_ce

rouge_scorer = RougeScorer(["rouge1", "rougeL"], use_stemmer=True)


def eval_accuracy(logits, labels):
    """mm/eval.py:23-32."""
    preds = np.asarray(jnp.argmax(logits, -1))
    shifted = np.asarray(labels)[..., 1:]
    mask = shifted != -100
    acc = ((preds[..., :-1] == shifted) & mask).sum() / max(mask.sum(), 1)
    return {"eval accuracy": float(acc)}


def eval_rouge_recall(gen_answers, true_ans, indices):
    rouge1, rougeL = {}, {}
    for idx, gen, gt in zip(indices, gen_answers, true_ans):
        scores = rouge_scorer.score(gt, gen)
        rouge1[idx] = scores["rouge1"].recall
        rougeL[idx] = scores["rougeL"].recall
    return {"rouge1_recall": rouge1, "rougeL_recall": rougeL}


def _model_losses(apply_fn, batch):
    """(per-seq summed CE, valid-token counts) for one collated batch."""
    out = apply_fn(batch)
    loss = seq_sum_ce(out["logits"], jnp.asarray(batch["labels"]))
    n_tok = (np.asarray(batch["labels"]) != -100).sum(-1)
    return np.asarray(loss), n_tok


def eval_perturbation_ratio(base_loader, perturb_loader, apply_fn):
    """mm/eval.py:46-92: paraphrase vs N perturbed answers per sample."""
    logs = defaultdict(dict)
    for batch, perturb in zip(base_loader, perturb_loader):
        batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        perturb = {k: v for k, v in perturb.items() if isinstance(v, np.ndarray)}
        indices = [int(i) for i in batch.pop("indices")]
        perturb.pop("indices")
        bsz, num_seq = perturb["input_ids"].shape[:2]
        flat_perturb = {
            k: v.reshape(bsz * num_seq, *v.shape[2:]) for k, v in perturb.items()
        }

        gt_loss, num_token_gt = _model_losses(apply_fn, batch)
        p_loss_flat, p_tok_flat = _model_losses(apply_fn, flat_perturb)
        perturb_loss = p_loss_flat.reshape(bsz, num_seq)
        num_token_perturb = p_tok_flat.reshape(bsz, num_seq)

        perturb_loss_pt = perturb_loss / num_token_perturb
        gt_loss_pt = gt_loss / num_token_gt
        truth_ratio = np.exp(gt_loss_pt - perturb_loss_pt.mean(-1))

        logs["average_perturb_loss"].update(dict(zip(indices, perturb_loss_pt.tolist())))
        logs["avg_paraphrased_loss"].update(dict(zip(indices, gt_loss_pt.tolist())))
        logs["truth_ratio"].update(dict(zip(indices, truth_ratio.tolist())))
        logs["paraphrased_loss"].update(dict(zip(indices, gt_loss.tolist())))
        logs["perturb_loss"].update(dict(zip(indices, perturb_loss.tolist())))
        logs["num_token_paraphrased"].update(dict(zip(indices, num_token_gt.tolist())))
        logs["num_token_perturb"].update(dict(zip(indices, num_token_perturb.tolist())))
    return logs


def _gen_prompt_rows(batch, tok, generate_with_images):
    """Generation inputs for one eval batch: the per-row question span
    (exactly as the main loop builds them), pixel rows, and the
    ground-truth draft corpus.  ``batch`` must still hold 'answers'."""
    import numpy as np

    raw_answers = np.asarray(batch["answers"])
    answers = [tok.decode(a, skip_special_tokens=True) for a in raw_answers]
    draft_ref = np.where(raw_answers == tok.pad_token_id, -2, raw_answers)
    if generate_with_images:
        ids_np = np.asarray(batch["input_ids"])
        qmask = (np.asarray(batch["labels"]) == -100) & (
            np.asarray(batch["attention_mask"]) == 1)
        rows = [ids_np[r][qmask[r]].tolist() for r in range(len(ids_np))]
        pix = np.asarray(batch["pixel_values"])
    else:
        str_inputs = [tok.decode(r, skip_special_tokens=True) for r in batch["input_ids"]]
        questions = [s[: s.rfind(a)] if a and s.rfind(a) != -1 else s
                     for s, a in zip(str_inputs, answers)]
        rows = [tok.encode(q, add_special_tokens=True) for q in questions]
        pix = None
    return rows, pix, draft_ref


def _pregenerate(gen_engine, eval_loader, tok, max_new_tokens, generate_with_images):
    """Continuous-batching pregeneration (beyond-reference): submit EVERY
    eval sample's question to the serving engine up front and drain once —
    finished slots refill across batch boundaries, so one long answer never
    stalls the rest of the dataset.  Tokens equal the per-batch
    greedy_generate path (tests/test_serve.py exactness), so the eval logs
    are unchanged."""
    reqs = []
    for batch in eval_loader:
        rows, pix, dref = _gen_prompt_rows(batch, tok, generate_with_images)
        for i, row in enumerate(rows):
            reqs.append(gen_engine.submit(
                row, max_new_tokens,
                pixel_values=None if pix is None else pix[i],
                draft_ref=dref[i].tolist() if gen_engine.K else None,
            ))
    gen_engine.drain(reqs)
    return [tok.decode(r.tokens, skip_special_tokens=True) for r in reqs]


def get_all_evals(
    eval_task: str,
    eval_loader,
    base_loader,
    perturb_loader,
    *,
    apply_fn,
    generate_fn,
    processor,
    max_new_tokens: int,
    generate_with_images: bool = False,
    gen_engine=None,
):
    """mm/eval.py:102-163.

    ``gen_engine``: optional ServingEngine — generations run as ONE
    continuous-batching drain over the whole task up front (_pregenerate)
    instead of per-batch greedy_generate calls; output text is identical."""
    logs = defaultdict(dict)
    gen_answers, true_ans, all_questions, all_indices = [], [], [], []

    logs.update(eval_perturbation_ratio(base_loader, perturb_loader, apply_fn))

    tok = processor.tokenizer
    gen_cache = (
        _pregenerate(gen_engine, eval_loader, tok, max_new_tokens, generate_with_images)
        if gen_engine is not None else None)
    gen_cursor = 0
    for batch in eval_loader:
        indices = [int(i) for i in batch.pop("indices")]
        raw_answers = np.asarray(batch.pop("answers"))
        answers = [tok.decode(a, skip_special_tokens=True) for a in raw_answers]
        # ground-truth answer tokens as the speculative-decode reference
        # corpus (generate.py draft_ref): -2 marks padding (never matches).
        # Purely a draft SOURCE — generation stays exactly greedy.
        draft_ref = np.where(raw_answers == tok.pad_token_id, -2, raw_answers)

        gt_loss, num_token_gt = _model_losses(apply_fn, batch)

        # strip answers from decoded inputs → question texts (mm/eval.py:120-124)
        str_inputs = [tok.decode(r, skip_special_tokens=True) for r in batch["input_ids"]]
        questions = [s[: s.rfind(a)] if a and s.rfind(a) != -1 else s for s, a in zip(str_inputs, answers)]

        if gen_cache is not None:
            # engine pregeneration: texts were drained up front, in order
            n_rows = len(batch["input_ids"])
            gen_texts = gen_cache[gen_cursor: gen_cursor + n_rows]
            gen_cursor += n_rows
        elif generate_with_images:
            # question span = -100-labeled non-pad positions (incl. the
            # expanded image tokens) — exact and tokenizer-agnostic
            from multimodal_unlearning_tpu.evaluation.generate import pad_prompts

            ids_np = np.asarray(batch["input_ids"])
            qmask = (np.asarray(batch["labels"]) == -100) & (
                np.asarray(batch["attention_mask"]) == 1
            )
            q_rows = [ids_np[r][qmask[r]].tolist() for r in range(len(ids_np))]
            ids, mask = pad_prompts(q_rows, tok.pad_token_id)
            gen_texts = generate_fn(
                {"input_ids": ids, "attention_mask": mask,
                 "pixel_values": batch["pixel_values"], "draft_ref": draft_ref},
                max_new_tokens,
            )
        else:
            # reference quirk: re-tokenize text-only questions
            from multimodal_unlearning_tpu.evaluation.generate import pad_prompts

            q_enc = [tok.encode(q, add_special_tokens=True) for q in questions]
            ids, mask = pad_prompts(q_enc, tok.pad_token_id)
            gen_texts = generate_fn(
                {"input_ids": ids, "attention_mask": mask, "pixel_values": None,
                 "draft_ref": draft_ref},
                max_new_tokens,
            )

        gen_answers.extend(gen_texts)
        true_ans.extend(answers)
        all_questions.extend(questions)
        all_indices.extend(indices)

        gt_loss_pt = gt_loss / num_token_gt
        logs["avg_gt_loss"].update(dict(zip(indices, gt_loss_pt.tolist())))
        logs["gt_loss"].update(dict(zip(indices, gt_loss.tolist())))
        logs["num_token_gt"].update(dict(zip(indices, num_token_gt.tolist())))
        logs["generated_text"].update(
            dict(zip(indices, zip(questions, gen_texts, answers)))
        )

    logs.update(eval_rouge_recall(gen_answers, true_ans, all_indices))

    if "eval_log" not in eval_task:
        normalized = {}
        for idx, gl in logs["avg_gt_loss"].items():
            truth_prob = np.exp(-gl)
            perturb_prob = np.exp(-np.asarray(logs["average_perturb_loss"][idx]))
            normalized[idx] = float(-np.log(truth_prob / (perturb_prob.sum() + truth_prob)))
        logs["normalized_gt_loss"] = normalized
    return logs


def nlp_split_symbol(tags: dict) -> tuple[str, bool]:
    """(split_symbol, reappend) of the NLP eval's prompt recovery
    (nlp/evaluate_util.py:149-155): the reference splits the decoded input at
    ``" [/INST]"`` for llama2-7b-family models and re-appends the symbol to
    the prompt; every other family splits at ``"Answer: "`` and does NOT
    re-append (the model is expected to emit the answer tag itself).
    Expressed through the registry tags instead of name-prefix matching:
    an empty answer_tag means the instruction format → (question_end_tag,
    True); otherwise → (answer_tag, False)."""
    answer_tag = tags.get("answer_tag", "") or ""
    if answer_tag:
        return answer_tag, False
    return tags.get("question_end_tag", "") or "", True


def _nlp_split_questions(dec, answers, split_symbol, reappend):
    """Prompt/ground-truth recovery from decoded inputs (the reference's
    run_generation split rule — see nlp_get_all_evals docstring)."""
    q_texts, gts = [], []
    for s, fallback in zip(dec, answers):
        parts = s.split(split_symbol) if split_symbol else [s]
        if len(parts) > 1:
            q_texts.append(parts[0] + (split_symbol if reappend else ""))
            gts.append(parts[1])
        else:
            q_texts.append(s)
            gts.append(fallback)
    return q_texts, gts


def _nlp_pregenerate(gen_engine, eval_loader, tok, tags, max_new_tokens):
    """Continuous-batching pregeneration for the text stack — the NLP
    analog of _pregenerate (prompts recovered by the split rule, ground
    truths seeding the speculative draft corpus)."""
    split_symbol, reappend = nlp_split_symbol(tags)
    reqs = []
    for batch in eval_loader:
        answers = batch.get("answers_text", [""] * len(batch["input_ids"]))
        dec = [tok.decode(r, skip_special_tokens=True) for r in batch["input_ids"]]
        q_texts, gts = _nlp_split_questions(dec, answers, split_symbol, reappend)
        for q, gt in zip(q_texts, gts):
            dref = tok.encode(gt, add_special_tokens=False) if gen_engine.K else None
            reqs.append(gen_engine.submit(
                tok.encode(q, add_special_tokens=True), max_new_tokens,
                draft_ref=dref))
    gen_engine.drain(reqs)
    return [tok.decode(r.tokens, skip_special_tokens=True) for r in reqs]


def nlp_get_all_evals(
    eval_task: str,
    eval_loader,
    base_loader,
    perturb_loader,
    *,
    apply_fn,
    generate_fn,
    tok,
    tags: dict,
    normalize_gt: bool | None = None,
    gen_engine=None,
    max_new_tokens: int | None = None,
):
    """nlp/evaluate_util.py:252-335 — the text-stack eval engine.

    Differs from the MM ``get_all_evals`` above in prompt/ground-truth
    recovery: the reference derives BOTH from the decoded input split at the
    family split symbol (``run_generation``, nlp/evaluate_util.py:146-170) —
    the ROUGE ground truth is the decoded text after the symbol (i.e. the
    answer as it survived tokenization/truncation), not the dataset answer
    column.  Rows where the symbol is absent fall back to the row's dataset
    answer (the reference would IndexError there).

    ``generate_fn(prompt_texts) -> generated_texts`` handles encoding,
    left-padding and decode; ``normalize_gt`` defaults to the reference
    main()'s rule (every task except the ``eval_log*`` pair)."""
    logs = defaultdict(dict)
    logs.update(eval_perturbation_ratio(base_loader, perturb_loader, apply_fn))

    split_symbol, reappend = nlp_split_symbol(tags)
    gen_cache = (
        _nlp_pregenerate(gen_engine, eval_loader, tok, tags, max_new_tokens)
        if gen_engine is not None else None)
    gen_cursor = 0
    gen_answers, true_ans, all_indices = [], [], []
    for batch in eval_loader:
        indices = [int(i) for i in batch.pop("indices")]
        batch.pop("questions", None)
        answers = batch.pop("answers_text", [""] * len(indices))

        gt_loss, num_token_gt = _model_losses(apply_fn, batch)

        dec = [tok.decode(r, skip_special_tokens=True) for r in batch["input_ids"]]
        q_texts, gts = _nlp_split_questions(dec, answers, split_symbol, reappend)
        if gen_cache is not None:
            gen_texts = gen_cache[gen_cursor: gen_cursor + len(q_texts)]
            gen_cursor += len(q_texts)
        else:
            try:
                # ground-truth texts seed the speculative-decode reference
                # corpus when the CLI's generate_fn supports it
                gen_texts = generate_fn(q_texts, ref_texts=gts)
            except TypeError:
                gen_texts = generate_fn(q_texts)

        gen_answers.extend(gen_texts)
        true_ans.extend(gts)
        all_indices.extend(indices)
        gt_loss_pt = gt_loss / num_token_gt
        logs["avg_gt_loss"].update(dict(zip(indices, gt_loss_pt.tolist())))
        logs["gt_loss"].update(dict(zip(indices, gt_loss.tolist())))
        logs["num_token_gt"].update(dict(zip(indices, num_token_gt.tolist())))
        logs["generated_text"].update(
            dict(zip(indices, zip(q_texts, gen_texts, gts)))
        )

    logs.update(eval_rouge_recall(gen_answers, true_ans, all_indices))

    if normalize_gt is None:
        normalize_gt = "eval_log" not in eval_task
    if normalize_gt:
        normalized = {}
        for idx, gl in logs["avg_gt_loss"].items():
            truth_prob = np.exp(-gl)
            perturb_prob = np.exp(-np.asarray(logs["average_perturb_loss"][idx]))
            normalized[idx] = float(-np.log(truth_prob / (perturb_prob.sum() + truth_prob)))
        logs["normalized_gt_loss"] = normalized
    return logs


def save_eval_logs(save_dir, eval_task, logs) -> str:
    from multimodal_unlearning_tpu.cli.common import rank_suffix

    Path(save_dir).mkdir(parents=True, exist_ok=True)
    path = os.path.join(save_dir, f"{eval_task}{rank_suffix()}.json")
    with open(path, "w") as f:
        json.dump(logs, f, indent=4, default=float)
    return path


def save_aggregated(save_dir, aggregated) -> str:
    from multimodal_unlearning_tpu.cli.common import rank_suffix

    path = os.path.join(save_dir, f"eval_log_aggregated{rank_suffix()}.json")
    with open(path, "w") as f:
        json.dump(aggregated, f, indent=4, default=float)
    return path
