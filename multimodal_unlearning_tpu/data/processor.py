"""MMProcessor: chat templating, tokenization, image preprocessing, collation.

Reimplements the reference's processor+collator pipeline
(mm/dataset.py:22-51, 283-354) with TPU-static shapes:

- chat templates are plain functions (the reference's llava jinja template,
  config/model_config.yaml:63, renders ``USER: <image>\\n{q} ASSISTANT: {a}``);
- ``<image>`` is expanded to ``num_image_tokens`` copies *in the collator*
  (HF processor behavior) so the model's splice is a static masked gather;
- label masking matches mm/dataset.py:324-341 — question tokens and padding
  → −100 — but the question-token count is taken in *expanded* token space,
  so the whole image span is masked (the reference undercounts by
  num_image_tokens−1 because it counts the unexpanded ``<image>``; that
  quirk trains on a slice of the question text — deliberately not replicated,
  flag ``hf_question_count_quirk=True`` restores it);
- padding: left (reference default) or right, to the longest sequence
  rounded up to ``pad_multiple`` (flash-block friendly buckets).
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def format_llava(question: str, answer: str | None, has_image: bool):
    """llava chat template (config/model_config.yaml:63 semantics)."""
    q = "USER: " + ("<image>\n" if has_image else "") + question + " "
    if answer is None:
        return q + "ASSISTANT:"
    return q + "ASSISTANT: " + answer + " "


def format_qwen(question: str, answer: str | None, has_image: bool):
    q = (
        "<|im_start|>user\n"
        + ("<image>" if has_image else "")
        + question
        + "<|im_end|>\n<|im_start|>assistant\n"
    )
    if answer is None:
        return q
    return q + answer + "<|im_end|>"


def format_tagged(question: str, answer: str | None, tags: dict):
    """LLM families: question_start_tag/question_end_tag/answer_tag
    (nlp/data_module.py format, config/model_config.yaml:1-47)."""
    q = tags["question_start_tag"] + question + tags["question_end_tag"] + tags.get("answer_tag", "")
    if answer is None:
        return q
    return q + answer

CHAT_TEMPLATES = {"llava": format_llava, "qwen": format_qwen}


def preprocess_image_hf(arr: np.ndarray, image_size: int) -> np.ndarray:
    """transformers.CLIPImageProcessor-exact path for uint8 RGB arrays:
    shortest-edge bicubic resize (PIL backend, as HF uses) + center crop +
    rescale + normalize (reference mm/dataset.py:315-322)."""
    from PIL import Image

    h, w = arr.shape[:2]
    short, long_ = (h, w) if h <= w else (w, h)
    nl = int(image_size * long_ / short)
    nh, nw = (image_size, nl) if h <= w else (nl, image_size)
    if (nh, nw) != (h, w):
        arr = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BICUBIC))
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    arr = arr[top:top + image_size, left:left + image_size]
    return (arr.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def preprocess_image(img, image_size: int) -> np.ndarray:
    """→ [image_size, image_size, 3] float32, CLIP-normalized.

    uint8 RGB inputs take the HF-bit-exact path (C++ fast kernel with a PIL
    fallback computing the identical arithmetic); float inputs (synthetic
    corpora) are resized directly to square."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3:
        from multimodal_unlearning_tpu.utils.native import clip_preprocess_batch

        out = clip_preprocess_batch(arr[None], image_size, CLIP_MEAN, CLIP_STD)
        if out is not None:
            return out[0]
        return preprocess_image_hf(arr, image_size)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[:2] != (image_size, image_size):
        try:
            from PIL import Image

            im = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))
            im = im.resize((image_size, image_size), Image.BICUBIC)
            arr = np.asarray(im).astype(np.float32) / 255.0
        except Exception:
            import jax

            arr = np.asarray(
                jax.image.resize(arr, (image_size, image_size, 3), "bicubic")
            )
    return (arr - CLIP_MEAN) / CLIP_STD


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 28 * 28 * 1280):
    """Qwen2VLImageProcessor target-size arithmetic (factor-aligned dims,
    pixel budget, aspect preserved)."""
    import math

    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def qwen_patchify(arr: np.ndarray, patch_size: int = 14, merge_size: int = 2,
                  temporal: int = 2) -> np.ndarray:
    """Normalized [H, W, 3] → Qwen2-VL flatten-order patches
    [grid_h·grid_w, 3·temporal·P·P] (single image, frame duplicated)."""
    H, W, C = arr.shape
    gh, gw = H // patch_size, W // patch_size
    x = np.repeat(arr.transpose(2, 0, 1)[None], temporal, axis=0)  # [T, C, H, W]
    x = x.reshape(
        1, temporal, C,
        gh // merge_size, merge_size, patch_size,
        gw // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return np.ascontiguousarray(
        x.reshape(gh * gw, C * temporal * patch_size * patch_size)
    )


def preprocess_image_qwen(img, image_size: int, patch_size: int = 14,
                          merge_size: int = 2) -> np.ndarray:
    """Qwen2VLImageProcessor-exact single-image path at a fixed-resolution
    operating point: smart_resize→PIL bicubic, rescale, CLIP normalize,
    flatten-order patchify.  Returns [N_patches, patch_dim]."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.dtype == np.uint8:
        h, w = arr.shape[:2]
        nh, nw = smart_resize(h, w, factor=patch_size * merge_size)
        # pin to the static op-point resolution so shapes stay jit-stable
        if (nh, nw) != (image_size, image_size):
            nh = nw = image_size
        if (nh, nw) != (h, w):
            from PIL import Image

            arr = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BICUBIC))
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
        if arr.shape[:2] != (image_size, image_size):
            import jax

            arr = np.asarray(
                jax.image.resize(arr, (image_size, image_size, 3), "bicubic")
            )
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return qwen_patchify(arr, patch_size, merge_size)


def _round_up(n, m):
    return (n + m - 1) // m * m


class MMProcessor:
    def __init__(
        self,
        tokenizer,
        *,
        image_size: int = 336,
        num_image_tokens: int = 576,
        chat_template: str = "llava",
        padding_side: str = "left",
        pad_multiple: int = 128,
        hf_question_count_quirk: bool = False,
        tags: dict | None = None,
        vision_mode: str = "clip",
        vision_wrap: tuple | None = None,
        patch_size: int = 14,
        spatial_merge_size: int = 2,
    ):
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.num_image_tokens = num_image_tokens
        self.template = CHAT_TEMPLATES.get(chat_template) if chat_template in CHAT_TEMPLATES else None
        self.tags = tags
        self.padding_side = padding_side
        self.pad_multiple = pad_multiple
        self.hf_question_count_quirk = hf_question_count_quirk
        self.vision_mode = vision_mode  # "clip" (LLaVA) | "qwen2vl" (patches)
        self.vision_wrap = vision_wrap  # (vision_start_id, vision_end_id)
        self.patch_size = patch_size
        self.spatial_merge_size = spatial_merge_size

    # -- formatting -------------------------------------------------------
    def format(self, question: str, answer: str | None, has_image: bool) -> str:
        if self.template is not None:
            return self.template(question, answer, has_image)
        return format_tagged(question, answer, self.tags or {})

    def _encode_expand(self, text: str) -> list[int]:
        ids = self.tokenizer.encode(text, add_special_tokens=True)
        img_id = getattr(self.tokenizer, "image_token_id", -1)
        out: list[int] = []
        for i in ids:
            if i == img_id:
                if self.vision_wrap is not None:  # qwen2vl: <|vision_start|>…<|vision_end|>
                    out.append(self.vision_wrap[0])
                    out.extend([img_id] * self.num_image_tokens)
                    out.append(self.vision_wrap[1])
                else:
                    out.extend([img_id] * self.num_image_tokens)
            else:
                out.append(i)
        return out

    def encode_sample(self, sample: dict, max_length: int):
        """→ (ids, num_question_tokens) in expanded token space."""
        has_image = sample.get("image") is not None
        q_text = self.format(sample["question"], None, has_image)
        full_text = self.format(sample["question"], sample["answer"], has_image)
        full_ids = self._encode_expand(full_text)[:max_length]
        if self.hf_question_count_quirk:
            n_q = len(self.tokenizer.encode(q_text, add_special_tokens=True))
        else:
            n_q = len(self._encode_expand(q_text))
        return full_ids, min(n_q, len(full_ids))

    # -- collation --------------------------------------------------------
    def collate(
        self,
        samples: list[dict],
        max_length: int,
        *,
        return_indices: bool = False,
        return_answers: bool = False,
    ) -> dict:
        """mm_data_collator_preprocessor analog (mm/dataset.py:291-354)."""
        nested = isinstance(samples[0], list)
        if nested:
            list_size = len(samples[0])
            samples = [s for group in samples for s in group]

        encoded = [self.encode_sample(s, max_length) for s in samples]
        S = _round_up(max(len(ids) for ids, _ in encoded), self.pad_multiple)
        S = min(S, _round_up(max_length, self.pad_multiple))
        pad_id = self.tokenizer.pad_token_id
        B = len(samples)

        # native collator core (C++ pad+mask) with numpy fallback inside
        from multimodal_unlearning_tpu.utils.native import pad_and_mask

        input_ids, attention_mask, labels = pad_and_mask(
            [ids for ids, _ in encoded], [n_q for _, n_q in encoded], S, pad_id,
            pad_left=self.padding_side == "left",
        )

        if self.vision_mode == "qwen2vl":
            g = self.image_size // self.patch_size
            patch_dim = 3 * 2 * self.patch_size**2
            pixel_values = np.zeros((B, g * g, patch_dim), np.float32)
            for r, s in enumerate(samples):
                if s.get("image") is not None:
                    pixel_values[r] = preprocess_image_qwen(
                        s["image"], self.image_size, self.patch_size, self.spatial_merge_size
                    )
        else:
            pixel_values = np.zeros((B, self.image_size, self.image_size, 3), np.float32)
            for r, s in enumerate(samples):
                if s.get("image") is not None:
                    pixel_values[r] = preprocess_image(s["image"], self.image_size)

        out = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels,
            "pixel_values": pixel_values,
        }
        if return_answers:
            ans = [self.tokenizer.encode(s["answer"]) for s in samples]
            A = max(len(a) for a in ans)
            answers = np.full((B, A), pad_id, np.int32)
            for r, a in enumerate(ans):
                answers[r, :len(a)] = a
            out["answers"] = answers
        if return_indices:
            out["indices"] = np.asarray([s["idx"] for s in samples], np.int32)

        if nested:
            out = {
                k: v.reshape(len(v) // list_size, list_size, *v.shape[1:])
                for k, v in out.items()
            }
        return out

    def collate_forget(self, samples: list[dict], max_length: int) -> dict:
        """Per-split fan-out (mm/dataset.py:283-288)."""
        splits = samples[0].keys()
        return {
            split: self.collate([s[split] for s in samples], max_length)
            for split in splits
        }
