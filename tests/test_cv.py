"""CV-stack tests: scoring math, U-LIRA/U-MIA, unlearning methods smoke +
gradient-ascent effect, shadow split layout."""

import numpy as np
import pytest

from multimodal_unlearning_tpu.cv import attack, data, score, train, unlearn
from multimodal_unlearning_tpu.models import resnet

CFG = resnet.ResNetConfig(widths=(8, 8, 16, 16), small_inputs=True)


@pytest.fixture(scope="module")
def corpus():
    ds = data.SyntheticFaces(n_persons=12, images_per_person=8, image_size=32, seed=0)
    images = data.preprocess(ds.images())
    labels = ds.labels
    splits = data.person_splits(labels, forget_size=10, seed=0)
    return ds, images, labels, splits


def test_person_splits_disjoint(corpus):
    ds, images, labels, splits = corpus
    f = set(labels[splits["forget_10"]])
    r = set(labels[splits["retain_90"]])
    h = set(labels[splits["holdout_10"]])
    assert not (f & r) and not (f & h) and not (r & h)
    assert len(f) >= 1 and len(h) >= 1


def test_shadow_splits_layout(corpus):
    ds, images, labels, splits = corpus
    shadows = data.shadow_splits(labels, splits, forget_size=10, n_splits=8, seed=0)
    assert len(shadows) == 8
    f = set(splits["forget_10"])
    h = set(splits["holdout_10"])
    for s in shadows[:4]:
        assert f <= set(s["train"]) and not (h & set(s["train"]))
        assert s["with_forget"]
    for s in shadows[4:]:
        assert h <= set(s["train"]) and not (f & set(s["train"]))
        assert not s["with_forget"]


def test_score_perfect_and_scrambled():
    rng = np.random.default_rng(0)
    n_id, per = 6, 8
    labels = np.repeat(np.arange(n_id), per)
    centers = rng.normal(size=(n_id, 16)) * 10
    vectors = centers[labels] + rng.normal(size=(len(labels), 16)) * 0.01
    groups = {"all": list(range(len(labels)))}
    acc = score.score(vectors, labels, groups, num_enroll=5)
    assert acc["all"] == 1.0
    # scrambled embeddings → chance-level
    acc2 = score.score(rng.normal(size=vectors.shape), labels, groups, num_enroll=5)
    assert acc2["all"] < 0.9


def test_enrollment_flags_order():
    labels = np.array([0, 0, 0, 1, 0, 1, 1])
    flags = score.enrollment_flags(labels, num_enroll=2)
    np.testing.assert_array_equal(flags, [1, 1, 0, 1, 0, 1, 0])


def test_ulira_separable():
    """in-models yield high logits for members: attack should be ~perfect."""
    rng = np.random.default_rng(0)
    n_samples, n_models = 10, 32
    Q = n_models // 4
    results = np.zeros((n_samples * 2, n_models))
    forget_inds = list(range(n_samples))
    holdout_inds = list(range(n_samples, 2 * n_samples))
    # members get logit ~5 in models trained on them, ~-5 otherwise
    results[forget_inds, : 2 * Q] = 5 + rng.normal(size=(n_samples, 2 * Q)) * 0.1
    results[forget_inds, 2 * Q :] = -5 + rng.normal(size=(n_samples, 2 * Q)) * 0.1
    results[holdout_inds, 2 * Q :] = 5 + rng.normal(size=(n_samples, 2 * Q)) * 0.1
    results[holdout_inds, : 2 * Q] = -5 + rng.normal(size=(n_samples, 2 * Q)) * 0.1
    acc = attack.ulira(results, forget_inds, holdout_inds)
    assert acc > 0.95
    umia_acc = attack.umia(results, forget_inds, holdout_inds)
    assert umia_acc["tree"] > 0.95 and umia_acc["linear"] > 0.95


def test_ulira_indistinguishable_is_chance():
    rng = np.random.default_rng(1)
    results = rng.normal(size=(20, 32))
    acc = attack.ulira(results, list(range(10)), list(range(10, 20)))
    assert 0.2 < acc < 0.8


def test_sample_logits_reflect_cluster_quality():
    rng = np.random.default_rng(2)
    labels = np.repeat(np.arange(4), 8)
    centers = rng.normal(size=(4, 16)) * 5
    tight = centers[labels] + rng.normal(size=(32, 16)) * 0.01
    loose = rng.normal(size=(32, 16))
    lt = attack.sample_logits(tight, labels)
    ll = attack.sample_logits(loose, labels)
    assert np.median(lt) > np.median(ll)


def test_finetune_reduces_loss(corpus):
    ds, images, labels, splits = corpus
    p, h, s, losses = train.train_classifier(
        CFG, images, labels, ds.n_persons, epochs=3, batch_size=24, lr=0.05, seed=0,
    )
    assert losses[-1] < losses[0]
    emb = train.embed_all(CFG, p, s, images)
    assert emb.shape == (len(images), CFG.widths[-1])


@pytest.mark.parametrize("method", ["neggrad", "retrain", "sparsity", "scrub", "rmu", "twins", "scrub_orig", "llmu", "dpo", "finetune"])
def test_unlearn_methods_run(corpus, method):
    ds, images, labels, splits = corpus
    pre = train.train_classifier(CFG, images, labels, ds.n_persons, epochs=1, batch_size=24, lr=0.05, seed=0)
    ckpt = (pre[0], pre[1], pre[2])
    p, h, s = unlearn.unlearn(
        method, CFG, ckpt, ckpt, images, labels, splits,
        epochs=1, batch_size=16, lr=0.01, seed=0, num_classes=ds.n_persons,
    )
    emb = train.embed_all(CFG, p, s, images)
    assert np.isfinite(emb).all()


def test_fleet_train_matches_sequential(corpus):
    """Vmapped shadow fleet == per-shadow sequential training (same seeds,
    same batch orders) — the TPU-native replacement for the reference's 128
    sequential runs (cv/run_finetune.py:10-20)."""
    import jax

    from multimodal_unlearning_tpu.cv import fleet

    ds, images, labels, splits = corpus
    shadows = data.shadow_splits(labels, splits, forget_size=10, n_splits=4, seed=0)
    sel = np.stack([np.asarray(s["train"]) for s in shadows])

    # lr=0 freezes params → every step's loss depends only on the batch
    # schedule: exact multi-epoch schedule equivalence, no chaotic drift
    _, _, _, flosses = fleet.train_classifier_fleet(
        CFG, images, labels, ds.n_persons, sel,
        epochs=2, batch_size=16, lr=0.0, seed=7,
    )
    for i in range(len(shadows)):
        _, _, _, losses = train.train_classifier(
            CFG, images[sel[i]], labels[sel[i]], ds.n_persons,
            epochs=2, batch_size=16, lr=0.0, seed=7 + i,
        )
        np.testing.assert_allclose(flosses[i], losses, rtol=1e-4, atol=1e-4)

    # real lr, ONE step: vmapped update math == sequential update math
    # (multi-step trajectories diverge chaotically from vmap-level numerics)
    fp, fh, fbn, flosses = fleet.train_classifier_fleet(
        CFG, images, labels, ds.n_persons, sel[:, :16],
        epochs=1, batch_size=16, lr=0.05, seed=7,
    )
    for i in range(len(shadows)):
        p, h, bn, losses = train.train_classifier(
            CFG, images[sel[i, :16]], labels[sel[i, :16]], ds.n_persons,
            epochs=1, batch_size=16, lr=0.05, seed=7 + i,
        )
        np.testing.assert_allclose(flosses[i], losses, rtol=1e-4, atol=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a)[i], np.asarray(b), rtol=2e-3, atol=2e-3
            ),
            (fp, fh, fbn), (p, h, bn),
        )


@pytest.mark.parametrize("method", ["neggrad", "scrub", "rmu", "dpo", "llmu", "finetune"])
def test_fleet_unlearn_matches_sequential(corpus, method):
    import jax

    from multimodal_unlearning_tpu.cv import fleet

    ds, images, labels, splits = corpus
    # two distinct finetuned "shadows"
    ckpts = [
        train.train_classifier(CFG, images, labels, ds.n_persons, epochs=1,
                               batch_size=16, lr=0.05, seed=s)[:3]
        for s in (0, 1)
    ]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *ckpts)
    pre = ckpts[0]

    # small lr bounds chaotic vmap-vs-single drift over the epoch
    fp, fh, fbn = fleet.unlearn_fleet(
        method, CFG, stacked, pre, images, labels, splits,
        epochs=1, batch_size=16, lr=1e-4, seed=3, num_classes=ds.n_persons,
    )
    for i in (0, 1):
        p, h, bn = unlearn.unlearn(
            method, CFG, ckpts[i], pre, images, labels, splits,
            epochs=1, batch_size=16, lr=1e-4, seed=3 + i, num_classes=ds.n_persons,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a)[i], np.asarray(b), rtol=3e-3, atol=3e-3
            ),
            (fp, fh, fbn), (p, h, bn),
        )
