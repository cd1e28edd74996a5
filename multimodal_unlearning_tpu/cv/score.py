"""Enrollment-prototype face-ID scoring (reference: cv/score.py:79-121).

For each identity, the first ``num_enroll`` embeddings (dataset order) are
enrolled; the prototype is their normalized mean.  Remaining samples are
classified by cosine nearest prototype; accuracy is reported per sample
group {forget, retain, holdout}.
"""

from __future__ import annotations

import numpy as np


def enrollment_flags(labels: np.ndarray, num_enroll: int = 5) -> np.ndarray:
    """1 for the first min(count, num_enroll) samples of each label, in
    dataset order (cv/score.py:102-109 value_counts/explode semantics)."""
    flags = np.zeros(len(labels), np.int32)
    seen: dict[int, int] = {}
    for i, l in enumerate(labels):
        l = int(l)
        if seen.get(l, 0) < num_enroll:
            flags[i] = 1
        seen[l] = seen.get(l, 0) + 1
    return flags


def prototypes(vectors: np.ndarray, labels: np.ndarray, flags: np.ndarray):
    ref_labels = sorted(set(int(l) for l in labels[flags == 1]))
    protos = []
    for l in ref_labels:
        sel = (labels == l) & (flags == 1)
        m = vectors[sel].mean(axis=0)
        protos.append(m / (np.linalg.norm(m) + 1e-12))
    return np.array(ref_labels), np.stack(protos)


def score(
    vectors: np.ndarray,
    labels: np.ndarray,
    groups: dict[str, list[int]],
    num_enroll: int = 5,
) -> dict[str, float]:
    """accuracy per group over non-enrolled samples."""
    flags = enrollment_flags(labels, num_enroll)
    ref_labels, protos = prototypes(vectors, labels, flags)
    normed = vectors / (np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12)
    preds = ref_labels[np.argmax(normed @ protos.T, axis=1)]

    out = {}
    for name, idx in groups.items():
        idx = [i for i in idx if flags[i] == 0]
        if not idx:
            out[name] = float("nan")
            continue
        out[name] = float(np.mean(preds[idx] == labels[idx]))
    return out
