"""Membership-inference attacks: U-LIRA and U-MIA (reference: cv/attack.py).

Model-bank layout over ``n_models`` shadow checkpoints (default 128):
quarters [0:Q] and [Q:2Q] trained WITH the forget set, [2Q:3Q] and [3Q:4Q]
with the holdout set instead.  Per-sample logit = log-odds of the cosine
prototype proba (cv/attack.py:91-113).

- U-LIRA (cv/attack.py:128-182): per-sample Gaussian likelihood-ratio test;
  location = median, scale = MAD/0.6745 (cv/utils.py:10-20); accuracy =
  mean((p > .5) == membership).
- U-MIA (cv/attack.py:184-208): pooled DecisionTree / LogisticRegression on
  shadow logits.
"""

from __future__ import annotations

import numpy as np
from scipy import stats

from multimodal_unlearning_tpu.cv.score import enrollment_flags


def rms(arr):
    """MAD-based robust std (cv/utils.py:10-20)."""
    med = np.median(arr)
    return np.median(np.abs(arr - med)) / 0.6745


def sample_logits(vectors: np.ndarray, labels: np.ndarray, num_enroll: int = 5) -> np.ndarray:
    """Per-sample log-odds of cosine similarity to own-class prototype
    (cv/attack.py:91-107: prototypes from enrolled rows, proba clipped [0,1])."""
    flags = enrollment_flags(labels, num_enroll)
    protos = {}
    for l in sorted(set(int(x) for x in labels)):
        sel = (labels == l) & (flags == 1)
        if sel.sum() == 0:
            sel = labels == l
        m = vectors[sel].mean(axis=0)
        protos[l] = m / (np.linalg.norm(m) + 1e-12)
    normed = vectors / (np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12)
    proba = np.clip(
        np.array([np.sum(normed[i] * protos[int(labels[i])]) for i in range(len(labels))]),
        0, 1,
    )
    logits = np.log(proba + 1e-45) - np.log(1 - proba + 1e-45)
    # diverged models can emit NaN embeddings; a NaN logit would crash the
    # pooled attack — treat as zero-evidence instead
    return np.nan_to_num(logits, nan=0.0, posinf=103.0, neginf=-103.0)


def _lira_block(target, in_dist, out_dist):
    proba = []
    for i in range(target.shape[0]):
        in_mean, in_std = np.median(in_dist[i]), rms(in_dist[i])
        out_mean, out_std = np.median(out_dist[i]), rms(out_dist[i])
        n_in = stats.norm.pdf(target[i], in_mean, in_std + 1e-45)
        n_out = stats.norm.pdf(target[i], out_mean, out_std + 1e-45)
        proba.extend(n_in / (1e-45 + n_in + n_out))
    return proba


def ulira(results: np.ndarray, forget_inds, holdout_inds) -> float:
    """results: [n_samples, n_models]; returns attack accuracy."""
    Q = results.shape[1] // 4
    r = results
    proba, status = [], []

    f = r[forget_inds]
    proba += _lira_block(f[:, 0:Q], f[:, Q:2 * Q], f[:, 3 * Q:4 * Q]); status += [1] * f.shape[0] * Q
    proba += _lira_block(f[:, 2 * Q:3 * Q], f[:, Q:2 * Q], f[:, 3 * Q:4 * Q]); status += [0] * f.shape[0] * Q

    h = r[holdout_inds]
    proba += _lira_block(h[:, 2 * Q:3 * Q], h[:, 3 * Q:4 * Q], h[:, Q:2 * Q]); status += [1] * h.shape[0] * Q
    proba += _lira_block(h[:, 0:Q], h[:, 3 * Q:4 * Q], h[:, Q:2 * Q]); status += [0] * h.shape[0] * Q

    proba, status = np.array(proba), np.array(status)
    return float(np.mean((proba > 0.5) == status))


def umia(results: np.ndarray, forget_inds, holdout_inds) -> dict[str, float]:
    from sklearn.linear_model import LogisticRegression
    from sklearn.tree import DecisionTreeClassifier

    Q = results.shape[1] // 4
    r = results
    in_dist = np.append(r[forget_inds][:, Q:2 * Q].reshape(-1), r[holdout_inds][:, 3 * Q:4 * Q].reshape(-1))
    out_dist = np.append(r[forget_inds][:, 3 * Q:4 * Q].reshape(-1), r[holdout_inds][:, Q:2 * Q].reshape(-1))
    features = np.append(in_dist, out_dist).reshape(-1, 1)
    targets = np.array([1] * len(in_dist) + [0] * len(out_dist))

    tree = DecisionTreeClassifier(max_leaf_nodes=256, criterion="entropy")
    linear = LogisticRegression()
    tree.fit(features, targets)
    linear.fit(features, targets)

    target_logits = np.hstack([
        r[forget_inds][:, 0:Q].reshape(-1),
        r[forget_inds][:, 2 * Q:3 * Q].reshape(-1),
        r[holdout_inds][:, 2 * Q:3 * Q].reshape(-1),
        r[holdout_inds][:, 0:Q].reshape(-1),
    ]).reshape(-1, 1)
    status = np.array(
        [1] * (Q * len(forget_inds)) + [0] * (Q * len(forget_inds))
        + [1] * (Q * len(holdout_inds)) + [0] * (Q * len(holdout_inds))
    )
    return {
        "tree": float(np.mean((tree.predict_proba(target_logits)[:, 1] > 0.5) == status)),
        "linear": float(np.mean((linear.predict_proba(target_logits)[:, 1] > 0.5) == status)),
    }
