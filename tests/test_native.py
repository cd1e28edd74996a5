"""Native C++ pipeline kernels vs numpy fallbacks."""

import numpy as np
import pytest

from multimodal_unlearning_tpu.data.prefetch import PrefetchLoader
from multimodal_unlearning_tpu.utils import native


def _python_pad(token_rows, n_question, seq_len, pad_id, pad_left):
    B = len(token_rows)
    ids = np.full((B, seq_len), pad_id, np.int32)
    attn = np.zeros((B, seq_len), np.int32)
    labels = np.full((B, seq_len), -100, np.int32)
    for r, row in enumerate(token_rows):
        row = row[:seq_len]
        n = len(row)
        start = seq_len - n if pad_left else 0
        ids[r, start:start + n] = row
        attn[r, start:start + n] = 1
        q = min(n_question[r], n)
        labels[r, start + q:start + n] = row[q:]
    return ids, attn, labels


def test_native_builds():
    assert native.available(), "C++ toolchain present in image; lib must build"


@pytest.mark.parametrize("pad_left", [True, False])
def test_pad_and_mask_matches_python(pad_left):
    rng = np.random.default_rng(0)
    rows = [list(rng.integers(1, 100, n)) for n in (5, 12, 1, 9)]
    nq = [2, 4, 1, 20]
    got = native.pad_and_mask(rows, nq, 16, 0, pad_left=pad_left)
    want = _python_pad(rows, nq, 16, 0, pad_left)
    for g, w, name in zip(got, want, ("ids", "attn", "labels")):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_pad_and_mask_truncation():
    rows = [list(range(1, 30))]
    ids, attn, labels = native.pad_and_mask(rows, [3], 8, 0, pad_left=True)
    assert attn.sum() == 8
    np.testing.assert_array_equal(ids[0], np.arange(1, 9))
    assert (labels[0][:3] == -100).all() and (labels[0][3:] == ids[0][3:]).all()


def test_clip_preprocess_identity_size():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = native.clip_preprocess_batch(img, 8, mean, std)
    if out is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


@pytest.mark.parametrize("shape", [(223, 401), (401, 223), (96, 64), (50, 67), (336, 336)])
def test_clip_preprocess_matches_hf_exactly(shape):
    """Golden: C++ preprocess == transformers.CLIPImageProcessor bit-for-bit
    (shortest-edge bicubic + center crop + normalize, mm/dataset.py:315-322)."""
    transformers = pytest.importorskip("transformers")
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    S = 48
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": S}, crop_size={"height": S, "width": S}
    )
    want = proc(images=img, return_tensors="np")["pixel_values"][0]  # [3,S,S]

    from multimodal_unlearning_tpu.data.processor import CLIP_MEAN, CLIP_STD

    out = native.clip_preprocess_batch(img[None], S, CLIP_MEAN, CLIP_STD)
    if out is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(out[0].transpose(2, 0, 1), want)


def test_qwen_preprocess_matches_hf():
    """Golden: our smart_resize + patchify == transformers
    Qwen2VLImageProcessor (pixel order, grid, normalization) at the square
    operating point."""
    transformers = pytest.importorskip("transformers")
    from multimodal_unlearning_tpu.data.processor import preprocess_image_qwen

    rng = np.random.default_rng(11)
    S, P = 16, 4  # grid 4x4, factor 8
    img = rng.integers(0, 256, (S, S, 3), dtype=np.uint8)
    proc = transformers.Qwen2VLImageProcessor(
        patch_size=P, merge_size=2, temporal_patch_size=2,
        min_pixels=P * P * 4, max_pixels=P * P * 4 * 1280,
    )
    out = proc(images=img, return_tensors="np")
    want = out["pixel_values"]  # [N, 96]
    np.testing.assert_array_equal(out["image_grid_thw"][0], [1, S // P, S // P])
    got = preprocess_image_qwen(img, S, patch_size=P, merge_size=2)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_preprocess_image_hf_fallback_matches_hf():
    """PIL fallback path is also bit-exact vs the HF processor."""
    transformers = pytest.importorskip("transformers")
    from multimodal_unlearning_tpu.data.processor import preprocess_image_hf

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (123, 77, 3), dtype=np.uint8)
    S = 32
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": S}, crop_size={"height": S, "width": S}
    )
    want = proc(images=img, return_tensors="np")["pixel_values"][0]
    got = preprocess_image_hf(img, S)
    np.testing.assert_array_equal(got.transpose(2, 0, 1), want)


def test_prefetch_loader_yields_same_batches():
    class L:
        dataset = list(range(10))
        batch_size = 2

        def __len__(self):
            return 5

        def __iter__(self):
            for i in range(5):
                yield {"x": np.full((2,), i)}

    base = [b["x"][0] for b in L()]
    pre = [b["x"][0] for b in PrefetchLoader(L(), depth=2)]
    assert base == pre


def test_prefetch_loader_releases_producer_on_abandon():
    """An abandoned iteration (break / zip stopping early) must release the
    producer thread — it used to park on the full queue forever, leaving one
    live thread (holding loader state) per abandoned epoch."""
    import threading
    import time

    class L:
        dataset = list(range(20))
        batch_size = 1

        def __len__(self):
            return 20

        def __iter__(self):
            for i in range(20):
                yield {"x": np.full((1,), i)}

    before = threading.active_count()
    for batch in PrefetchLoader(L(), depth=2):
        break  # abandon immediately
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_prefetch_loader_propagates_errors():
    class Bad:
        dataset, batch_size = [], 1

        def __len__(self):
            return 1

        def __iter__(self):
            yield {"x": 1}
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(Bad()))
