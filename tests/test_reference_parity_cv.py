"""Differential parity for the CV attack/scoring stack vs the installed
torch reference (cv/attack.py U-LIRA + U-MIA; the shared pandas
enrollment/prototype machinery of cv/attack.py:91-108 and cv/score.py:102-121).

cv/attack.py is a top-level argparse script (no functions to import), so it
is DRIVEN via ``runpy`` in a tmp cwd with its input pickles pre-seeded — the
expensive checkpoints→logits branch (cv/attack.py:61-113) is skipped when the
logits pickle already exists, so only the attack math runs — and torchvision
(not installed) stubbed along with the hub-bound ``datasets.load_dataset``
call at cv/attack.py:45.  The printed attack accuracy is captured and
compared against this framework's ``cv.attack.ulira`` / ``cv.attack.umia``
on the SAME shadow-logit matrix.

cv/score.py is ``__main__``-guarded and CUDA-bound; its load-bearing scoring
math (the pandas value_counts→explode enrollment column, groupby-mean
prototypes, cosine-argmax preds) is identical to the logit-branch machinery
in cv/attack.py:91-108.  ``_ref_*`` below reproduce those pandas pipelines
verbatim (cited per line) as the oracle and are compared against our numpy
implementations (``cv.score.enrollment_flags/score``, ``cv.attack
.sample_logits``) on shared embeddings.

Operating note: the reference's enrollment column is POSITIONAL — pandas
assigns the exploded [1]*enroll+[0]*rest blocks in sorted-label order to rows
in dataset order, which is only correct because the CLEAR face dataset is
grouped by identity.  The parity data below is therefore sorted by label
(the reference's actual regime); our ``enrollment_flags`` generalizes to
unsorted rows but coincides exactly on sorted ones.
"""

from __future__ import annotations

import io
import pickle
import runpy
import sys
import types
from contextlib import redirect_stdout

import numpy as np
import pandas as pd
import pytest

REF_CV = "/root/reference/cv"

N_MODELS = 128  # the reference hard-codes quarter boundaries 32/64/96/128
Q = N_MODELS // 4


# ---------------------------------------------------------------------------
# shared synthetic shadow-logit matrix (what 128 shadow models would emit)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bank():
    rng = np.random.default_rng(7)
    n = 40
    forget_inds = np.arange(0, 10)
    holdout_inds = np.arange(30, 40)
    # models [0:2Q] trained WITH the forget set, [2Q:4Q] with holdout instead
    # (cv/prepare_vtofu_dataset.py quarter banks); give membership a real
    # but imperfect signal so accuracies land strictly inside (0.5, 1.0)
    results = rng.normal(1.5, 1.0, size=(n, N_MODELS))
    results[np.ix_(forget_inds, np.arange(0, 2 * Q))] += rng.normal(2.0, 0.7, (10, 2 * Q))
    results[np.ix_(holdout_inds, np.arange(2 * Q, 4 * Q))] += rng.normal(2.0, 0.7, (10, 2 * Q))
    return results, forget_inds, holdout_inds


def _run_reference_attack(tmp_path, monkeypatch, bank, attack: str) -> str:
    """Execute /root/reference/cv/attack.py's attack branch in-process."""
    results, forget_inds, holdout_inds = bank

    # --- the script's on-disk inputs (paths relative to cwd) ---------------
    d = tmp_path / f"attack_{attack}"
    (d / "logits/testm/forget_size=10").mkdir(parents=True)
    (d / "vtofu_metadata").mkdir()
    (d / "splits/vtofu").mkdir(parents=True)
    with open(d / "logits/testm/forget_size=10/resnet18.pickle", "wb") as f:
        pickle.dump(results, f)
    with open(d / "vtofu_metadata/forget_10.pickle", "wb") as f:
        pickle.dump(forget_inds, f)
    with open(d / "vtofu_metadata/holdout_10.pickle", "wb") as f:
        pickle.dump(holdout_inds, f)
    with open(d / "vtofu_metadata/labels.pickle", "wb") as f:
        pickle.dump({}, f)  # collate_fn closure only; never iterated
    with open(d / "splits/vtofu/split_000.pickle", "wb") as f:
        pickle.dump({}, f)
    monkeypatch.chdir(d)

    # --- stub the unavailable / hub-bound imports --------------------------
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_transforms = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "ToTensor", "Normalize"):
        setattr(tv_transforms, name, lambda *a, **k: (lambda x: x))
    tv_models.resnet18 = tv_models.resnet50 = lambda *a, **k: None
    tv.models, tv.transforms = tv_models, tv_transforms
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.models", tv_models)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tv_transforms)

    fake_ds = types.ModuleType("datasets")
    fake_ds.load_dataset = lambda *a, **k: []  # DataLoader built, never read
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    # cv/attack.py does `from utils import *` meaning cv/utils.py — evict any
    # previously imported reference-root utils and resolve cv/ first
    monkeypatch.delitem(sys.modules, "utils", raising=False)
    monkeypatch.syspath_prepend(REF_CV)

    monkeypatch.setattr(
        sys, "argv",
        ["attack.py", "--method", "testm", "--attack", attack, "--num_workers", "0"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        runpy.run_path(f"{REF_CV}/attack.py", run_name="__ref_cv_attack__")
    monkeypatch.delitem(sys.modules, "utils", raising=False)
    return buf.getvalue().strip().splitlines()[-1]


def test_ulira_matches_reference(tmp_path, monkeypatch, bank):
    from multimodal_unlearning_tpu.cv.attack import ulira

    printed = _run_reference_attack(tmp_path, monkeypatch, bank, "ulira")
    ref_acc = float(printed)
    results, forget_inds, holdout_inds = bank
    ours = ulira(results, forget_inds, holdout_inds)
    assert 0.5 < ref_acc < 1.0  # non-degenerate signal
    assert ours == pytest.approx(ref_acc, abs=0)


def test_umia_matches_reference(tmp_path, monkeypatch, bank):
    from multimodal_unlearning_tpu.cv.attack import umia

    printed = _run_reference_attack(tmp_path, monkeypatch, bank, "umia")
    ref_tree, ref_linear = (float(x) for x in printed.split())
    results, forget_inds, holdout_inds = bank
    ours = umia(results, forget_inds, holdout_inds)
    assert 0.5 < ref_tree < 1.0
    assert ours["tree"] == pytest.approx(ref_tree, abs=0)
    assert ours["linear"] == pytest.approx(ref_linear, abs=0)


# ---------------------------------------------------------------------------
# pandas enrollment / prototype / scoring oracles (cv/score.py, attack.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(3)
    n_labels, per = 6, 8
    labels = np.repeat(np.arange(n_labels), per)  # sorted by label (CLEAR order)
    vectors = rng.normal(size=(n_labels * per, 12))
    # push some cosines negative so the reference's .clip(0, 1) fires
    vectors[5] = -vectors[4]
    return vectors, labels


def _ref_reference_column(labels, num_enroll=5):
    """cv/score.py:102-109 == cv/attack.py:93-99, verbatim pandas."""
    df = pd.DataFrame({"label": labels})
    return (
        df["label"]
        .value_counts()
        .sort_index()
        .apply(lambda x: [1] * min(x, num_enroll) + [0] * (x - min(x, num_enroll)))
        .explode()
        .reset_index(drop=True)
        .values.astype(int)
    )


def _ref_sample_logits(vectors, labels, num_enroll=5):
    """cv/attack.py:91-108 verbatim pandas (per-model logit construction)."""
    test_dataset = pd.DataFrame({"label": labels, "vectors": list(vectors)})
    test_dataset["reference"] = _ref_reference_column(labels, num_enroll)
    ref = test_dataset[test_dataset["reference"].eq(1)]
    ref = (
        ref.groupby("label")["vectors"].mean()
        .apply(lambda x: x / np.linalg.norm(x))
        .reset_index()
        .rename(columns={"vectors": "ref_vectors"})
    )
    test_dataset = pd.merge(test_dataset, ref, on=["label"], how="inner")
    test_dataset["vectors"] = test_dataset["vectors"].apply(lambda x: x / np.linalg.norm(x))
    test_dataset["proba"] = test_dataset.apply(
        lambda x: np.sum(x["vectors"] * x["ref_vectors"]).clip(0, 1), axis=1
    )
    return (np.log(test_dataset["proba"] + 1e-45) - np.log(1 - test_dataset["proba"] + 1e-45)).values


def _ref_score(vectors, labels, groups, num_enroll=5):
    """cv/score.py:95-121 verbatim pandas (prototype face-ID accuracy)."""
    test_dataset = pd.DataFrame({"label": labels, "vectors": list(vectors)})
    for name, idx in groups.items():
        test_dataset.loc[idx, "sample"] = name
    test_dataset["reference"] = _ref_reference_column(labels, num_enroll)

    ref = test_dataset[test_dataset["reference"].eq(1)]
    ev = test_dataset[test_dataset["reference"].eq(0)].copy()
    ref = ref.groupby("label")["vectors"].mean()
    ref_labels = ref.index.tolist()
    ref_vectors = np.stack(ref.values)
    ref_vectors = ref_vectors / np.linalg.norm(ref_vectors, axis=1, keepdims=True)
    ev["pred"] = ev["vectors"].apply(
        lambda x: ref_labels[np.argmax(ref_vectors @ x / np.linalg.norm(x))]
    )
    return {
        name: float(np.mean(g["pred"] == g["label"]))
        for name, g in ev.groupby("sample")
    }


def test_enrollment_flags_match_reference_column(embeddings):
    from multimodal_unlearning_tpu.cv.score import enrollment_flags

    _, labels = embeddings
    np.testing.assert_array_equal(
        enrollment_flags(labels, 5), _ref_reference_column(labels, 5)
    )
    # and at enroll > per-label count (the min(x, enroll) branch)
    np.testing.assert_array_equal(
        enrollment_flags(labels, 11), _ref_reference_column(labels, 11)
    )


def test_sample_logits_match_reference(embeddings):
    from multimodal_unlearning_tpu.cv.attack import sample_logits

    vectors, labels = embeddings
    ref = _ref_sample_logits(vectors, labels)
    ours = sample_logits(vectors, labels, num_enroll=5)
    # ours normalizes with a +1e-12 epsilon (NaN guard for diverged shadow
    # models emitting zero embeddings); that perturbs logits at ~1e-11
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_prototype_score_matches_reference(embeddings):
    from multimodal_unlearning_tpu.cv.score import score

    vectors, labels = embeddings
    groups = {
        "forget": list(range(0, 16)),
        "retain": list(range(16, 40)),
        "holdout": list(range(40, 48)),
    }
    ref = _ref_score(vectors, labels, groups)
    ours = score(vectors, labels, groups, num_enroll=5)
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=0), k
