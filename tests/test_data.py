"""Data-layer tests: tokenizer, templates, label masking, dataset policies."""

import numpy as np

from multimodal_unlearning_tpu.data import (
    ByteTokenizer,
    DataLoader,
    ImageCaptioningDataset,
    MMMixedForgetDataset,
    MMProcessor,
    SyntheticClearData,
)
from multimodal_unlearning_tpu.data.datasets import load_idk_answers
from multimodal_unlearning_tpu.data.loader import stack_microbatches
from multimodal_unlearning_tpu.data.processor import format_llava


def make_processor(**kw):
    tok = ByteTokenizer()
    defaults = dict(image_size=32, num_image_tokens=16, pad_multiple=8)
    defaults.update(kw)
    return MMProcessor(tok, **defaults)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    ids2 = tok.encode("a <image> b")
    assert tok.image_token_id in ids2
    assert tok.decode(ids2) == "a  b"


def test_llava_template():
    assert format_llava("Q?", None, True) == "USER: <image>\nQ? ASSISTANT:"
    assert format_llava("Q?", "A.", False) == "USER: Q? ASSISTANT: A. "


def test_collate_label_masking_left_pad():
    proc = make_processor()
    samples = [
        {"question": "Who?", "answer": "Bob", "image": np.zeros((32, 32, 3), np.uint8)},
        {"question": "A much longer question here?", "answer": "Alice", "image": None},
    ]
    out = proc.collate(samples, max_length=256)
    ids, labels, mask = out["input_ids"], out["labels"], out["attention_mask"]
    B, S = ids.shape
    assert S % 8 == 0
    for r in range(B):
        valid = mask[r] == 1
        # padding always masked
        assert (labels[r][~valid] == -100).all()
        # answer tokens are labeled; question tokens are -100
        lab_valid = labels[r][valid]
        assert (lab_valid != -100).any() and (lab_valid == -100).any()
        # left padding: first valid position is where mask flips
        first = np.argmax(valid)
        assert valid[first:].all()
    # row 0 has expanded image tokens, all masked -100
    img_positions = ids[0] == proc.tokenizer.image_token_id
    assert img_positions.sum() == proc.num_image_tokens
    assert (labels[0][img_positions] == -100).all()
    # row 1 (no image) has none
    assert (ids[1] == proc.tokenizer.image_token_id).sum() == 0


def test_answer_tokens_survive_labeling():
    proc = make_processor()
    s = {"question": "Q?", "answer": "XYZ", "image": None}
    out = proc.collate([s], max_length=128)
    lab = out["labels"][0]
    tail = [t for t in lab if t != -100]
    decoded = proc.tokenizer.decode(tail)
    assert "XYZ" in decoded


def test_nested_collation_for_sku():
    proc = make_processor()
    groups = [
        [{"question": "q", "answer": f"a{i}", "image": None} for i in range(3)],
        [{"question": "q", "answer": f"b{i}", "image": None} for i in range(3)],
    ]
    out = proc.collate(groups, max_length=64)
    assert out["input_ids"].shape[:2] == (2, 3)
    assert out["labels"].shape[:2] == (2, 3)


def test_forget_dataset_policies():
    for loss, want in [
        ("dpo", {"forget", "retain", "idk"}),
        ("sku", {"forget", "retain", "random"}),
        ("idk", {"idk", "retain"}),
        ("npo", {"forget", "retain"}),
    ]:
        ds = MMMixedForgetDataset(
            "synthetic", "synthetic", loss, "retain90", "forget10", seed=0
        )
        item = ds[0]
        assert set(item.keys()) == want, loss
        if "random" in item:
            assert len(item["random"]) == 3
            qs = {r["question"] for r in item["random"]}
            # SKU: all random items share the forget question (for captions the
            # question is re-drawn from the caption pool per _format_pair)
            assert len(item["random"]) == 3


def test_idk_substitution_actually_substitutes():
    """The reference builds idk_itm then passes forget_itm (mm/dataset.py:266)
    — its MM idk split IS the forget split.  The default replicates that
    (tests/test_reference_parity_data.py proves it differentially);
    idk_fix=True applies the substitution the NLP stack does."""
    idk = set(a for a in load_idk_answers())
    ds = MMMixedForgetDataset("synthetic", "synthetic", "dpo", "retain90", "forget10", seed=0, idk_fix=True)
    hits = 0
    for i in range(min(6, len(ds))):
        ans = ds[i]["idk"]["answer"]
        hits += ans in idk
    assert hits == min(6, len(ds))


def test_captioning_dataset_strategies():
    ds = ImageCaptioningDataset("synthetic", "retain_perturbed", question_strategy="random_faces", caption_key="name")
    item = ds[0]
    assert item["question"].startswith("The name of the person")
    ds2 = ImageCaptioningDataset("synthetic", "retain_perturbed", question_strategy="column", question_key="question")
    assert ds2[0]["question"].startswith("Who is shown")
    # list-valued caption key → list of samples
    ds3 = ImageCaptioningDataset("synthetic", "retain_perturbed", question_strategy="random_caption", caption_key="perturbed_captions")
    assert isinstance(ds3[0], list) and len(ds3[0]) == 3


def test_dataloader_and_microbatch_stack():
    ds = MMMixedForgetDataset("synthetic", "synthetic", "npo", "retain90", "forget10", seed=0)
    proc = make_processor()
    dl = DataLoader(ds, 4, lambda s: proc.collate_forget(s, 128), shuffle=True, seed=0)
    batch = next(iter(dl))
    assert batch["forget"]["input_ids"].shape[0] == 4
    stacked = stack_microbatches(batch, 2)
    assert stacked["forget"]["input_ids"].shape[:2] == (2, 2)


def test_synthetic_split_algebra():
    sd = SyntheticClearData(n_persons=10, qa_per_person=2)
    full = sd.split("full")
    forget = sd.split("forget10")
    retain = sd.split("retain90")
    assert len(forget) + len(retain) == len(full)
    mixed = sd.split("forget10+tofu")
    assert any(r["image"] is None for r in mixed)
    assert any(r["image"] is not None for r in mixed)
