"""Data-layer differential parity vs the installed torch reference.

Drives the reference's ACTUAL chat-templating + collator pipeline
(mm/dataset.py:22-51 convert_mm_data_to_model_format,
mm/dataset.py:291-354 mm_data_collator_preprocessor,
mm/dataset.py:283-288 mm_forget_data_collator_preprocessor,
mm/dataset.py:183-280 MMMixedForgetDataset) through a REAL
transformers.LlavaProcessor — a tiny byte-level BPE tokenizer + the
reference's pinned llava chat template (config/model_config.yaml:63) + a
CLIPImageProcessor at the parity op point (image 32, patch 8 → 16 expanded
image tokens) — and asserts this framework's MMProcessor
(data/processor.py) and MMMixedForgetDataset (data/datasets.py) produce
identical tensors and pair policies.

Parity-op-point notes:
- ``hf_question_count_quirk=True``: the reference counts question tokens on
  the UNEXPANDED text (one ``<image>`` token, mm/dataset.py:40) while the
  installed processor expands ids — the quirk flag reproduces that masking.
- ``pad_multiple=1``: HF pads to the batch longest; the framework's default
  flash-friendly 128-bucket padding is an intentional (shape-only) delta.
- the idk-pair quirk: the reference builds ``idk_itm`` with a substituted
  idk answer and then formats ``forget_itm`` anyway (mm/dataset.py:266) —
  its MM idk split IS the forget split.  ``idk_fix=False`` (default)
  reproduces that; ``idk_fix=True`` formats the substituted item (the NLP
  stack's behavior, nlp/data_module.py:87-90).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.ref_parity_common import REF_PATH, load_ref_module

pytestmark = pytest.mark.filterwarnings("ignore::UserWarning")

IMAGE_SIZE = 32
PATCH = 4  # 64 expanded image tokens — more than the byte-level question
           # length, so the reference's unexpanded-count masking quirk leaves
           # supervised image-token positions (asserted below)
NUM_IMG_TOKENS = (IMAGE_SIZE // PATCH) ** 2  # +1 CLS -1 "default" strategy

# the reference's pinned llava chat template, config/model_config.yaml:63
LLAVA_TEMPLATE = (
    "{% for message in messages %}{% if message['role'] == 'system' %}"
    "{{ message['content'][0]['text'] }}{% else %}"
    "{{ message['role'].upper() + ': '}}{% endif %}"
    "{% for content in message['content'] | selectattr('type', 'equalto', 'image') %}"
    "{{ '<image>\n' }}{% endfor %}"
    "{% for content in message['content'] | selectattr('type', 'equalto', 'text') %}"
    "{{ content['text'] + ' '}}{% endfor %}{% endfor %}"
    "{% if add_generation_prompt %}{{ 'ASSISTANT:' }}{% endif %}"
)


@pytest.fixture(scope="module")
def hf_processor():
    pytest.importorskip("torch")
    from tokenizers import Tokenizer, decoders
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from transformers import (
        CLIPImageProcessor,
        LlavaProcessor,
        PreTrainedTokenizerFast,
    )

    alphabet = sorted(ByteLevel.alphabet())
    tok = Tokenizer(BPE(vocab={ch: i for i, ch in enumerate(alphabet)}, merges=[]))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>"
    )
    hf_tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    hf_tok.padding_side = "left"  # mm/finetune.py:40, mm/forget.py:54
    ip = CLIPImageProcessor(
        size={"shortest_edge": IMAGE_SIZE},
        crop_size={"height": IMAGE_SIZE, "width": IMAGE_SIZE},
        do_convert_rgb=False,
    )
    return LlavaProcessor(
        image_processor=ip,
        tokenizer=hf_tok,
        patch_size=PATCH,
        vision_feature_select_strategy="default",
        image_token="<image>",
        num_additional_image_tokens=1,
        chat_template=LLAVA_TEMPLATE,
    )


class _TokAdapter:
    """MMProcessor's tokenizer protocol over the shared HF fast tokenizer."""

    def __init__(self, hf_tok):
        self.hf = hf_tok
        self.pad_token_id = hf_tok.pad_token_id
        self.eos_token_id = hf_tok.eos_token_id
        self.image_token_id = hf_tok.convert_tokens_to_ids("<image>")

    def encode(self, text, add_special_tokens=False):
        return self.hf.encode(text, add_special_tokens=add_special_tokens)


@pytest.fixture(scope="module")
def ours_processor(hf_processor):
    from multimodal_unlearning_tpu.data.processor import MMProcessor

    return MMProcessor(
        _TokAdapter(hf_processor.tokenizer),
        image_size=IMAGE_SIZE,
        num_image_tokens=NUM_IMG_TOKENS,
        chat_template="llava",
        padding_side="left",
        pad_multiple=1,  # HF pads to batch-longest
        hf_question_count_quirk=True,
    )


def _img(rng, h=40, w=48):
    return rng.integers(0, 255, (h, w, 3)).astype(np.uint8)


def _samples(rng, n=3, image_every=1, idx0=0):
    out = []
    for i in range(n):
        out.append(
            {
                "idx": idx0 + i,
                "question": f"What is the color of object {i}?",
                "answer": f"object {i} is blue and somewhat shiny no {i}",
                "image": _img(rng) if (image_every and i % image_every == 0) else None,
            }
        )
    return out


def _assert_batch_equal(ref_inputs, ours, samples):
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["input_ids"]), np.asarray(ours["input_ids"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["attention_mask"]), np.asarray(ours["attention_mask"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["labels"]), np.asarray(ours["labels"])
    )
    if "pixel_values" in ref_inputs and not isinstance(samples[0], list):
        # reference stacks only the rows that HAVE images (in order); ours is
        # a dense [B, H, W, 3] with zero rows for text-only samples
        ref_pix = np.asarray(ref_inputs["pixel_values"])  # [n_img, 3, H, W]
        ours_rows = [
            ours["pixel_values"][r]
            for r, s in enumerate(samples)
            if s.get("image") is not None
        ]
        assert len(ours_rows) == len(ref_pix)
        for ref_row, our_row in zip(ref_pix, ours_rows):
            np.testing.assert_allclose(
                np.moveaxis(ref_row, 0, -1), our_row, atol=1e-6
            )


def test_chat_format_and_question_count_match_reference(hf_processor, ours_processor):
    ref_ds = load_ref_module("mm.dataset")
    for has_image in (True, False):
        sample = {
            "question": "Who is shown here?",
            "answer": "a famous person with a hat",
            "image": _img(np.random.default_rng(0)) if has_image else None,
        }
        full_text, n_q_ref = ref_ds.convert_mm_data_to_model_format(
            hf_processor, sample
        )
        assert full_text == ours_processor.format(
            sample["question"], sample["answer"], has_image
        )
        _, n_q_ours = ours_processor.encode_sample(sample, max_length=256)
        assert n_q_ours == n_q_ref


def test_collator_matches_reference_mixed_batch(hf_processor, ours_processor):
    import torch

    ref_ds = load_ref_module("mm.dataset")
    rng = np.random.default_rng(1)
    samples = _samples(rng, n=3, image_every=2)  # rows 0,2 image; row 1 text
    with torch.no_grad():
        ref_inputs = ref_ds.mm_data_collator_preprocessor(
            [dict(s) for s in samples], hf_processor, max_length=256
        )
    ours = ours_processor.collate(samples, max_length=256)
    _assert_batch_equal(ref_inputs, ours, samples)
    # the quirk masking trains on expanded image-token positions past the
    # unexpanded question count — assert both engines agree there too
    img_id = hf_processor.tokenizer.convert_tokens_to_ids("<image>")
    assert (np.asarray(ours["labels"]) == img_id).any()


def test_collator_text_only_truncation_matches_reference(hf_processor, ours_processor):
    ref_ds = load_ref_module("mm.dataset")
    rng = np.random.default_rng(2)
    samples = _samples(rng, n=2, image_every=0)
    # max_length=32 cuts into the answers on the byte-level tokenizer
    ref_inputs = ref_ds.mm_data_collator_preprocessor(
        [dict(s) for s in samples], hf_processor, max_length=32
    )
    ours = ours_processor.collate(samples, max_length=32)
    _assert_batch_equal(ref_inputs, ours, samples)


def test_collator_answers_and_indices_match_reference(hf_processor, ours_processor):
    ref_ds = load_ref_module("mm.dataset")
    rng = np.random.default_rng(3)
    samples = _samples(rng, n=2, image_every=1, idx0=7)
    ref_inputs = ref_ds.mm_data_collator_preprocessor(
        [dict(s) for s in samples], hf_processor, max_length=256,
        return_indices=True, return_answers=True,
    )
    ours = ours_processor.collate(
        samples, max_length=256, return_indices=True, return_answers=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["indices"]), np.asarray(ours["indices"])
    )
    # reference left-pads answers (tokenizer padding side), ours right-aligns:
    # compare the pad-stripped token contents row-by-row
    pad = hf_processor.tokenizer.pad_token_id
    for ref_row, our_row in zip(
        np.asarray(ref_inputs["answers"]), np.asarray(ours["answers"])
    ):
        np.testing.assert_array_equal(ref_row[ref_row != pad], our_row[our_row != pad])


def test_collator_nested_matches_reference(hf_processor, ours_processor):
    ref_ds = load_ref_module("mm.dataset")
    rng = np.random.default_rng(4)
    nested = [_samples(rng, n=2, image_every=1, idx0=4 * g) for g in range(2)]
    ref_inputs = ref_ds.mm_data_collator_preprocessor(
        [list(map(dict, row)) for row in nested], hf_processor, max_length=256,
        return_indices=True,
    )
    ours = ours_processor.collate(nested, max_length=256, return_indices=True)
    assert np.asarray(ref_inputs["input_ids"]).ndim == 3
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["input_ids"]), np.asarray(ours["input_ids"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["labels"]), np.asarray(ours["labels"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref_inputs["indices"]).reshape(-1),
        np.asarray(ours["indices"]).reshape(-1),
    )


def test_forget_collator_split_fanout_matches_reference(hf_processor, ours_processor):
    ref_ds = load_ref_module("mm.dataset")
    rng = np.random.default_rng(5)
    f = _samples(rng, n=2, image_every=1)
    r = _samples(rng, n=2, image_every=0, idx0=10)
    pair_samples = [{"forget": f[i], "retain": r[i]} for i in range(2)]
    ref_inputs = ref_ds.mm_forget_data_collator_preprocessor(
        [{k: dict(v) for k, v in s.items()} for s in pair_samples],
        hf_processor, max_length=256,
    )
    ours = ours_processor.collate_forget(pair_samples, max_length=256)
    assert set(ref_inputs.keys()) == set(ours.keys()) == {"forget", "retain"}
    for split, rows in (("forget", f), ("retain", r)):
        _assert_batch_equal(ref_inputs[split], ours[split], rows)


# ---------------------------------------------------------------------------
# Dataset pair policy (MMMixedForgetDataset)
# ---------------------------------------------------------------------------


def _qa_rows(n, tag):
    return [
        {
            "image": None,
            "caption": None,
            "question": f"{tag} question {i}?",
            "answer": f"{tag} answer {i}",
        }
        for i in range(n)
    ]


def _make_ref_forget_ds(monkeypatch, loss, forget_rows, retain_rows):
    import random

    ref_ds = load_ref_module("mm.dataset")
    monkeypatch.setattr(
        ref_ds.datasets,
        "load_dataset",
        lambda path, *a, **kw: [dict(r) for r in (
            forget_rows if path == "forget" else retain_rows
        )],
    )
    monkeypatch.chdir(REF_PATH)  # it opens data/idontknow.jsonl relative
    random.seed(0)
    return ref_ds.MMMixedForgetDataset("forget", "retain", loss, "r", "f")


@pytest.mark.parametrize(
    "loss",
    ["dpo", "llmu", "idk", "sku", "npo", "grad_diff_forget_ce_retain_ce", "kl"],
)
def test_forget_dataset_pair_policy_matches_reference(monkeypatch, loss):
    from multimodal_unlearning_tpu.train.losses import batch_return_pairs

    ref = _make_ref_forget_ds(monkeypatch, loss, _qa_rows(4, "F"), _qa_rows(6, "R"))
    assert tuple(sorted(ref.return_pairs)) == tuple(sorted(batch_return_pairs(loss)))


def test_forget_dataset_idk_quirk_matches_reference(monkeypatch, tmp_path):
    """mm/dataset.py:266 formats ``forget_itm`` after building ``idk_itm`` —
    the reference's MM idk split IS the forget split.  idk_fix=False (default)
    reproduces it; idk_fix=True applies the substitution the NLP stack does."""
    from multimodal_unlearning_tpu.data.datasets import (
        MMMixedForgetDataset as OursDS,
        load_idk_answers,
    )

    forget_rows, retain_rows = _qa_rows(4, "F"), _qa_rows(6, "R")
    ref = _make_ref_forget_ds(monkeypatch, "dpo", forget_rows, retain_rows)
    for i in range(4):
        item = ref[i]
        assert item["idk"] == item["forget"]  # the quirk, differentially

    import datasets as hfds

    fdir, rdir = tmp_path / "f", tmp_path / "r"
    hfds.Dataset.from_list(forget_rows).save_to_disk(str(fdir))
    hfds.Dataset.from_list(retain_rows).save_to_disk(str(rdir))
    ours_ref = OursDS(str(fdir), str(rdir), "dpo", None, None, seed=0)
    ours_fix = OursDS(str(fdir), str(rdir), "dpo", None, None, seed=0, idk_fix=True)
    idk_corpus = set(load_idk_answers())
    for i in range(4):
        quirk_item, fixed_item = ours_ref[i], ours_fix[i]
        assert quirk_item["idk"] == quirk_item["forget"]
        assert quirk_item["forget"] == ref[i]["forget"]  # deterministic QA rows
        assert fixed_item["idk"]["answer"] in idk_corpus
        assert fixed_item["idk"]["question"] == fixed_item["forget"]["question"]
        # the rng stream is flag-independent: every other split identical
        assert fixed_item["forget"] == quirk_item["forget"]
        assert fixed_item["retain"] == quirk_item["retain"]


def test_nlp_convert_raw_matches_reference(hf_processor):
    """nlp/data_module.py:10-43 convert_raw_data_to_model_format vs
    data/nlp.py:convert_raw_to_model_format on a shared tokenizer: fixed
    max_length EOS right-padding, mask-0 pads, exactly-one-supervised-EOS
    labels, tag-counted question masking — both padded and truncated legs."""
    ref_nlp = load_ref_module("nlp.data_module")
    from multimodal_unlearning_tpu.data.nlp import convert_raw_to_model_format

    tok = hf_processor.tokenizer
    tags = {
        "question_start_tag": "[INST] ",
        "question_end_tag": " [/INST]",
        "answer_tag": "",
    }
    q = "Who wrote the famous book about whales?"
    a = "It was written by a person called Herman, a long time ago."
    # 72 truncates inside the ANSWER on the byte-level tokenizer; truncating
    # inside the question is untestable differentially — the reference's
    # unclamped masking loop (nlp/data_module.py:36-37) raises IndexError
    # there (ours clamps, data/nlp.py:74)
    for max_length in (160, 72):
        ref_ids, ref_labels, ref_mask = ref_nlp.convert_raw_data_to_model_format(
            tok, max_length, q, a, tags
        )
        ids, labels, mask = convert_raw_to_model_format(
            _TokAdapter(tok), max_length, q, a, tags
        )
        np.testing.assert_array_equal(np.asarray(ref_ids), ids)
        np.testing.assert_array_equal(np.asarray(ref_labels), labels)
        np.testing.assert_array_equal(np.asarray(ref_mask), mask)


def test_caption_questions_and_idk_corpus_match_reference():
    ref_ds = load_ref_module("mm.dataset")
    from multimodal_unlearning_tpu.data import datasets as ours_ds

    assert list(ref_ds.IMAGE_CAPTION_QUESTIONS) == list(ours_ds.IMAGE_CAPTION_QUESTIONS)
    # byte-exact corpus incl. readlines-with-newline semantics (the reference
    # keeps raw lines in the MM stack, mm/dataset.py:225; last line unterminated)
    ref_lines = open(f"{REF_PATH}/data/idontknow.jsonl").readlines()
    assert ours_ds.load_idk_answers() == ref_lines
