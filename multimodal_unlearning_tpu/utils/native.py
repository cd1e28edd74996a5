"""ctypes bridge to the C++ host-pipeline kernels (native/mmu_native.cpp).

Auto-builds the shared library on first use (``make -C native``) and falls
back to pure-numpy implementations when no toolchain is available — every
caller works either way; ``available()`` reports which path is live.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmmu_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64, i32p, i64p, f32p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.pad_and_mask.argtypes = [
        i32p, i64p, i32p, i64, i64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p, i32p,
    ]
    lib.clip_preprocess_batch.argtypes = [
        u8p, i64, i64, i64, f32p, i64, f32p, f32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pad_and_mask(token_rows, n_question, seq_len, pad_id, *, pad_left=True, ignore_index=-100):
    """Batched pad+mask. token_rows: list of int lists; → (ids, attn, labels)."""
    B = len(token_rows)
    lib = _load()
    if lib is None:
        ids = np.full((B, seq_len), pad_id, np.int32)
        attn = np.zeros((B, seq_len), np.int32)
        labels = np.full((B, seq_len), ignore_index, np.int32)
        for r, row in enumerate(token_rows):
            row = row[:seq_len]
            n = len(row)
            start = seq_len - n if pad_left else 0
            ids[r, start:start + n] = row
            attn[r, start:start + n] = 1
            q = min(n_question[r], n)
            labels[r, start + q:start + n] = row[q:]
        return ids, attn, labels

    offsets = np.zeros(B + 1, np.int64)
    for r, row in enumerate(token_rows):
        offsets[r + 1] = offsets[r] + len(row)
    tokens = np.asarray([t for row in token_rows for t in row], np.int32)
    if tokens.size == 0:
        tokens = np.zeros(1, np.int32)
    nq = np.asarray(n_question, np.int32)
    ids = np.empty((B, seq_len), np.int32)
    attn = np.empty((B, seq_len), np.int32)
    labels = np.empty((B, seq_len), np.int32)
    lib.pad_and_mask(
        _ptr(tokens, ctypes.c_int32), _ptr(offsets, ctypes.c_int64),
        _ptr(nq, ctypes.c_int32), B, seq_len, pad_id, ignore_index,
        1 if pad_left else 0,
        _ptr(ids, ctypes.c_int32), _ptr(attn, ctypes.c_int32), _ptr(labels, ctypes.c_int32),
    )
    return ids, attn, labels


def clip_preprocess_batch(images_u8: np.ndarray, out_hw: int, mean, std) -> np.ndarray | None:
    """HF-CLIP-exact preprocess (shortest-edge bicubic + center crop +
    normalize): [B, H, W, 3] uint8 → [B, out, out, 3] float32; None if no lib.
    Bit-faithful to transformers.CLIPImageProcessor (reference
    mm/dataset.py:315-322 arithmetic)."""
    lib = _load()
    if lib is None:
        return None
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    B, H, W, _ = images_u8.shape
    out = np.empty((B, out_hw, out_hw, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.clip_preprocess_batch(
        _ptr(images_u8, ctypes.c_uint8), B, H, W,
        _ptr(out, ctypes.c_float), out_hw,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
    )
    return out
