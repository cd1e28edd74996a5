"""Text-only (TOFU-style) datasets and collators (reference: nlp/data_module.py).

Semantics pinned to the reference:
- fixed ``max_length`` right-padding with EOS tokens, attention 0 on padding
  (nlp/data_module.py:20-33);
- labels: full ids if truncated, else ids + one EOS + (-100)s — exactly one
  EOS is supervised (:30-33);
- question tokens masked -100 via tag-formatted question token count (:35-37);
- forget pair policy with random retain pairing (idx + randint) (:85-97);
- DPO triplets idk/forget/retain (:97-130);
- multi-answer TextDatasetQA for perturbed lists (:133-188).
"""

from __future__ import annotations

import random

import numpy as np

from multimodal_unlearning_tpu.data.datasets import (
    SyntheticClearData,
    load_idk_answers,
    resolve_rows,
)


def resolve_text_rows(data_path: str, split: str | None) -> list[dict]:
    if data_path.startswith("synthetic"):
        cfg = {}
        if ":" in data_path:
            for kv in data_path.split(":", 1)[1].split(","):
                if "=" in kv:
                    k, v = kv.split("=")
                    cfg[k] = int(v)
        sd = SyntheticClearData(**cfg)
        rows = sd.rows("text")
        base = (split or "full").replace("_perturbed", "")
        n = len(rows)
        if base.startswith("forget"):
            pct = int("".join(c for c in base if c.isdigit()) or 10)
            rows = rows[: max(1, n * pct // 100)]
        elif base.startswith("retain"):
            pct = int("".join(c for c in base if c.isdigit()) or 90)
            rows = rows[max(1, n * (100 - pct) // 100):]
        elif base in ("real_authors", "world_facts"):
            rows = rows[: max(1, n // 4)]
        # reference key name is `perturbed_answer` (a list)
        out = []
        for i, r in enumerate(rows):
            r = dict(r, index=i)
            r["perturbed_answer"] = r.pop("perturbed_answers", [])
            out.append(r)
        return out
    return resolve_rows(data_path, split)


def convert_raw_to_model_format(tokenizer, max_length: int, question: str, answer: str, tags: dict):
    """→ (input_ids, labels, attention_mask) int32 arrays of length max_length."""
    q = tags["question_start_tag"] + question + tags["question_end_tag"]
    full = q + tags.get("answer_tag", "") + answer
    n_question = len(tokenizer.encode(q, add_special_tokens=True))

    ids = tokenizer.encode(full, add_special_tokens=True)[:max_length]
    pad = max_length - len(ids)
    eos = tokenizer.eos_token_id
    input_ids = np.asarray(ids + [eos] * pad, np.int32)
    attention = np.asarray([1] * len(ids) + [0] * pad, np.int32)
    if pad == 0:
        labels = list(ids)
    else:
        labels = ids + [eos] + [-100] * (pad - 1)
    labels = np.asarray(labels, np.int32)
    labels[: min(n_question, max_length)] = -100
    return input_ids, labels, attention


class TextForgetDatasetQA:
    """{forget|idk, retain} pairs (nlp/data_module.py:46-97)."""

    def __init__(self, data_path, tokenizer, tags, max_length=512, split="forget10",
                 loss_type="idk", eco_prompts_path=None, seed=0):
        self.tokenizer = tokenizer
        self.tags = tags
        self.max_length = max_length
        self.loss_type = loss_type
        if loss_type == "eco_ft" and eco_prompts_path:
            from pathlib import Path

            p = Path(eco_prompts_path)
            if (p / "eco_prompts.jsonl").exists() or p.suffix == ".jsonl":
                import json

                f = p / "eco_prompts.jsonl" if p.is_dir() else p
                self.forget_rows = [json.loads(line) for line in open(f)]
            else:
                import datasets as hfds

                self.forget_rows = [dict(r) for r in hfds.load_from_disk(str(p))]
        else:
            self.forget_rows = resolve_text_rows(data_path, split)
        retain_split = "retain" + str(100 - int(split.replace("forget", "").replace("_perturbed", "") or 10)).zfill(2)
        self.retain_rows = resolve_text_rows(data_path, retain_split)
        self.rng = random.Random(seed)
        if loss_type == "idk":
            self.split1, self.split2 = "idk", "retain"
            self.idk = load_idk_answers()
        else:
            self.split1, self.split2 = "forget", "retain"

    def __len__(self):
        return len(self.forget_rows)

    def __getitem__(self, idx):
        out = {}
        for data_type in (self.split1, self.split2):
            rows = self.retain_rows if data_type == "retain" else self.forget_rows
            i = idx if data_type != "retain" else (idx + self.rng.randint(0, len(self.retain_rows) - 1)) % len(self.retain_rows)
            question = rows[i]["question"]
            answer = self.idk[self.rng.randint(0, len(self.idk) - 1)].strip() if data_type == "idk" else rows[i]["answer"]
            out["retain" if data_type == "retain" else data_type] = convert_raw_to_model_format(
                self.tokenizer, self.max_length, question, answer, self.tags
            )
        return out


class TextForgetDatasetDPOQA:
    """{idk, forget, retain} triplets (nlp/data_module.py:97-130)."""

    def __init__(self, data_path, tokenizer, tags, max_length=512, split="forget10", seed=0):
        self.tokenizer = tokenizer
        self.tags = tags
        self.max_length = max_length
        self.forget_rows = resolve_text_rows(data_path, split)
        retain_split = "retain" + str(100 - int(split.replace("forget", "").replace("_perturbed", "") or 10)).zfill(2)
        self.retain_rows = resolve_text_rows(data_path, retain_split)
        self.idk = load_idk_answers()
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.forget_rows)

    def __getitem__(self, idx):
        out = {}
        for data_type in ("idk", "forget", "retain"):
            rows = self.forget_rows if data_type != "retain" else self.retain_rows
            i = idx if data_type != "retain" else (idx + self.rng.randint(0, len(self.retain_rows) - 1)) % len(self.retain_rows)
            question = rows[i]["question"]
            answer = self.idk[self.rng.randint(0, len(self.idk) - 1)].strip() if data_type == "idk" else rows[i]["answer"]
            out[data_type] = convert_raw_to_model_format(
                self.tokenizer, self.max_length, question, answer, self.tags
            )
        return out


class TextDatasetQA:
    """Eval dataset with multi-answer (perturbed) support (nlp/data_module.py:133-188)."""

    def __init__(self, data_path, tokenizer, tags, max_length=512, split=None,
                 question_key="question", answer_key="answer"):
        self.rows_ = resolve_text_rows(data_path, split)
        self.tokenizer = tokenizer
        self.tags = tags
        self.max_length = max_length
        self.qk, self.ak = question_key, answer_key

    def __len__(self):
        return len(self.rows_)

    def __getitem__(self, idx):
        row = self.rows_[idx]
        question = row[self.qk]
        answers = row[self.ak]
        if isinstance(answers, str):
            answers = [answers]
        ids, labels, attn = zip(*(
            convert_raw_to_model_format(self.tokenizer, self.max_length, question, a, self.tags)
            for a in answers
        ))
        squeeze = len(answers) == 1
        stack = lambda xs: xs[0] if squeeze else np.stack(xs)
        return {
            "input_ids": stack(list(ids)),
            "labels": stack(list(labels)),
            "attention_mask": stack(list(attn)),
            "idx": row["index"],
            "question": question,
            "answer": answers[0],
        }


def text_collator(samples: list[dict]) -> dict:
    """Stack per-split tuples → dict of arrays (nlp/dataloader.py:497-517)."""
    splits = samples[0].keys()
    out = {}
    for split in splits:
        ids = np.stack([s[split][0] for s in samples])
        labels = np.stack([s[split][1] for s in samples])
        attn = np.stack([s[split][2] for s in samples])
        out[split] = {"input_ids": ids, "labels": labels, "attention_mask": attn}
    return out


def eval_collator(samples: list[dict], tokenizer=None) -> dict:
    batch = {
        "input_ids": np.stack([s["input_ids"] for s in samples]),
        "labels": np.stack([s["labels"] for s in samples]),
        "attention_mask": np.stack([s["attention_mask"] for s in samples]),
        "indices": np.asarray([s["idx"] for s in samples]),
    }
    batch["questions"] = [s["question"] for s in samples]
    batch["answers_text"] = [s["answer"] for s in samples]
    return batch
