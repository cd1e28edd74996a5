"""Generate ECO-corrupted answers over the forget split → eco_ft dataset
(reference: methods/eco/prepare_eco_prompts.py:30-49).

The corrupted model answers each forget question; the (question, corrupted
answer) pairs become the ``eco_ft`` training set (consumed by
nlp/forget.py's eco_ft loss via TextForgetDatasetQA).
"""

from __future__ import annotations

import json
from pathlib import Path


from multimodal_unlearning_tpu.data.nlp import resolve_text_rows


def prepare_eco_prompts(
    attacked_model,
    tokenizer,
    tags: dict,
    data_path: str,
    split: str,
    out_dir: str,
    *,
    max_new_tokens: int = 32,
    batch_size: int = 8,
):
    rows = resolve_text_rows(data_path, split)
    out_rows = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        prompts = [
            tags["question_start_tag"] + r["question"] + tags["question_end_tag"] + tags.get("answer_tag", "")
            for r in chunk
        ]
        from multimodal_unlearning_tpu.evaluation.generate import pad_prompts

        enc = [tokenizer.encode(p, add_special_tokens=True) for p in prompts]
        ids, mask = pad_prompts(enc, tokenizer.pad_token_id)
        gen = attacked_model.generate(ids, mask, max_new_tokens=max_new_tokens, prompts=[r["question"] for r in chunk])
        for r, g in zip(chunk, gen):
            out_rows.append({
                "question": r["question"],
                "answer": tokenizer.decode(g, skip_special_tokens=True),
            })
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    with open(p / "eco_prompts.jsonl", "w") as f:
        for r in out_rows:
            f.write(json.dumps(r) + "\n")
    return out_rows
