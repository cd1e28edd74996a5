"""Real-data path integration: on-disk HF dataset (PIL images) + a trained
BPE AutoTokenizer driven through finetune → forget → eval with ZERO synthetic
fallback (reference loads the same way from the hub: mm/dataset.py:214-215,
mm/finetune.py:38-41, nlp/finetune.py:96-98)."""

import json

import numpy as np
import pytest

from multimodal_unlearning_tpu.config import load_config
from multimodal_unlearning_tpu.config.registry import config_dir


def _cfg(sub, name, **overrides):
    cfg = load_config(config_dir() / sub, name)
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        dict.__setitem__(node, parts[-1], v)
    return cfg


N_PERSONS = 40  # forget10 must cover one 8-device global batch


@pytest.fixture(scope="module")
def real_fixtures(tmp_path_factory):
    """Build a real tokenizer dir (AutoTokenizer-loadable) and a real
    image dataset dir (datasets.save_to_disk with PIL images)."""
    from PIL import Image
    import datasets as hfds
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    root = tmp_path_factory.mktemp("realdata")

    # --- rows with real (non-square) images -------------------------------
    rng = np.random.default_rng(0)

    def person_rows():
        rows = []
        for pid in range(N_PERSONS):
            name = f"Alice{pid}"
            img = Image.fromarray(
                rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
            )
            for q in range(2):
                rows.append(dict(
                    image=img,
                    question=f"Who appears in picture {q}?",
                    answer=name,
                    name=name,
                    caption=f"A photo of {name} at location {q}.",
                    paraphrased_caption=f"{name} pictured at spot {q}.",
                    perturbed_captions=[
                        f"A photo of Alice{(pid + d) % N_PERSONS} at location {q}."
                        for d in (1, 2)
                    ],
                    perturbed_names=[f"Alice{(pid + d) % N_PERSONS}" for d in (1, 2)],
                    options=[name, f"Alice{(pid + 1) % N_PERSONS}"],
                ))
        return rows

    def to_ds(rows):
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        return hfds.Dataset.from_dict(cols).cast_column("image", hfds.Image())

    rows = person_rows()
    k = max(1, len(rows) // 10)
    dd = hfds.DatasetDict({
        "full+tofu": to_ds(rows),
        "forget10+tofu": to_ds(rows[:k]),
        "retain90+tofu": to_ds(rows[k:]),
        "forget10_perturbed": to_ds(rows[:max(2, k)]),
    })
    data_dir = root / "faces_ds"
    dd.save_to_disk(str(data_dir))

    # --- real BPE tokenizer (trained, saved, AutoTokenizer-loadable) ------
    corpus = [r["question"] for r in rows] + [r["caption"] for r in rows] + [
        "USER: ASSISTANT: Question: Answer:",
        " ".join(f"Alice{i}" for i in range(N_PERSONS)),
    ]
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=240,
        special_tokens=["<pad>", "<s>", "</s>", "<unk>", "<image>"],
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=["<image>"],
    )
    tok_dir = root / "tokenizer"
    fast.save_pretrained(str(tok_dir))
    return str(data_dir), str(tok_dir)


def test_real_tokenizer_loads_and_maps_image_token(real_fixtures):
    from multimodal_unlearning_tpu.data import load_tokenizer

    _, tok_dir = real_fixtures
    tok = load_tokenizer(tok_dir, image_token="<image>")
    assert tok.image_token_id == 4  # the registry tiny-llava-real id
    ids = tok.encode("Question: Who? <image>", add_special_tokens=True)
    assert tok.image_token_id in ids
    assert max(ids) < 256


@pytest.fixture(scope="module")
def real_ft_dir(real_fixtures, tmp_path_factory):
    from multimodal_unlearning_tpu.cli import mm_finetune

    data_dir, tok_dir = real_fixtures
    out = tmp_path_factory.mktemp("real_ft")
    cfg = _cfg(
        "mm", "finetune",
        model_family="tiny-llava-real", data_path=data_dir, split="full+tofu",
        tokenizer_path=tok_dir, processor_path=tok_dir,
        batch_size=2, gradient_accumulation_steps=1, num_epochs=0.2,
        max_length=128, lr=1e-3, save_dir=str(out), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 4)
    mm_finetune.run(cfg)
    assert (out / "model.safetensors").exists()
    return out


def test_real_data_mm_forget(real_fixtures, real_ft_dir, tmp_path):
    from multimodal_unlearning_tpu.cli import mm_forget

    data_dir, tok_dir = real_fixtures
    cfg = _cfg(
        "mm", "forget",
        model_family="tiny-llava-real", model_path=str(real_ft_dir),
        tokenizer_path=tok_dir, processor_path=tok_dir,
        forget_data_path=data_dir, retain_data_path=data_dir,
        forget_split="forget10+tofu", retain_split="retain90+tofu",
        forget_loss="grad_diff_forget_ce_retain_ce",
        batch_size=1, gradient_accumulation_steps=1, num_epochs=0.5,
        max_length=128, save_dir=str(tmp_path / "gd"), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    history = mm_forget.run(cfg)
    assert history and all(np.isfinite(h["loss"]) for h in history)
    assert (tmp_path / "gd" / "model.safetensors").exists()


def test_real_data_mm_eval(real_fixtures, real_ft_dir, tmp_path):
    from multimodal_unlearning_tpu.cli import mm_eval

    data_dir, tok_dir = real_fixtures
    cfg = _cfg(
        "mm", "eval",
        model_family="tiny-llava-real", model_path=str(real_ft_dir),
        tokenizer_path=tok_dir, processor_path=tok_dir,
        save_dir=str(tmp_path / "eval"),
        ds_size=4, batch_size=4, max_length=256, dtype="float32",
        eval_task_ids=[2],
    )
    dict.__setitem__(cfg, "data_path", [data_dir] * 6)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
    agg = mm_eval.run(cfg)
    logs = agg["eval_log_forget.json"]
    assert set(logs) >= {"avg_gt_loss", "truth_ratio", "rougeL_recall", "generated_text"}
    json.loads((tmp_path / "eval" / "eval_log_aggregated.json").read_text())


def test_real_data_nlp_finetune(real_fixtures, tmp_path):
    """Text stack through AutoTokenizer + load_from_disk (nlp/finetune.py:96)."""
    from multimodal_unlearning_tpu.cli import nlp_finetune

    data_dir, tok_dir = real_fixtures
    cfg = _cfg(
        "nlp", "finetune",
        model_family="tiny-llama-test", data_path=data_dir, split="full+tofu",
        tokenizer_path=tok_dir,
        batch_size=2, gradient_accumulation_steps=1, num_epochs=0.2,
        max_length=64, lr=1e-3, save_dir=str(tmp_path / "nlp_ft"), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    nlp_finetune.run(cfg)
    assert (tmp_path / "nlp_ft" / "model.safetensors").exists()


def test_real_data_cv_pipeline(tmp_path):
    """CV stack ingests an on-disk HF dataset of real PIL images
    (cv/prepare_celeb_dataset.py:9-33 analog) — prepare → pretrain →
    shadow-finetune → unlearn → score, zero synthetic fallback."""
    from PIL import Image
    import datasets as hfds

    from multimodal_unlearning_tpu.cli import cv_run

    rng = np.random.default_rng(7)
    rows = {"image": [], "name": []}
    for pid in range(6):
        img = Image.fromarray(rng.integers(0, 256, (41, 53, 3), dtype=np.uint8))
        for _ in range(4):
            rows["image"].append(img)
            rows["name"].append(f"Celeb{pid}")
    ds = hfds.Dataset.from_dict(rows).cast_column("image", hfds.Image())
    data_dir = tmp_path / "faces"
    ds.save_to_disk(str(data_dir))

    cfg = _cfg(
        "cv", "pipeline",
        data=str(data_dir), stage="all", n_shadow=2, n_persons=6,
        images_per_person=4, image_size=32, forget_size=20,
        work_dir=str(tmp_path / "cv_work"), n_persons_pretrain=12, num_enroll=2,
    )
    cfg["finetune"]["epochs"] = 1
    cfg["unlearn"]["epochs"] = 1
    cfg["unlearn"]["method"] = "neggrad"
    cv_run.run(cfg)

    scores = json.loads((tmp_path / "cv_work" / "scores.json").read_text())
    assert set(scores) >= {"finetuned", "neggrad"}
    for kind in ("finetuned", "neggrad"):
        for grp in ("forget", "retain", "holdout"):
            assert np.isfinite(scores[kind][grp])
