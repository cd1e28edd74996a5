"""CV data: face corpus, person-disjoint splits, 128 shadow splits.

Reference: cv/prepare_vtofu_dataset.py (forget/retain/holdout author splits +
128 shadow splits: 64 forget-trained, 64 holdout-trained, each sampling 80
"other" identities), cv/prepare_celeb_dataset.py (person-disjoint pretrain
split).  ImageNet preprocessing per cv/score.py:29-35.
"""

from __future__ import annotations

import random

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images: np.ndarray) -> np.ndarray:
    """uint8 [N,H,W,3] → normalized float32."""
    x = images.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class SyntheticFaces:
    """Procedural face corpus: n_persons identities × images_per_person.

    Images carry a person-specific low-frequency pattern + noise so the
    embedding task is learnable; rows have name/caption like CLEAR.
    """

    def __init__(self, n_persons=20, images_per_person=8, image_size=32, seed=0,
                 noise: float = 0.2):
        """``noise`` ∈ [0,1): fraction of per-image random content.  The
        default identity pattern is strong (trivially separable); raise noise
        toward ~0.8 to make membership/unlearning effects measurable."""
        self.n_persons = n_persons
        self.images_per_person = images_per_person
        self.image_size = image_size
        self.seed = seed
        self.noise = noise
        self.labels = np.repeat(np.arange(n_persons), images_per_person)
        self.names = [f"Person{p:03d}" for p in self.labels]
        self.captions = [
            f"photo {i % images_per_person} of Person{p:03d}"
            for i, p in enumerate(self.labels)
        ]

    def __len__(self):
        return self.n_persons * self.images_per_person

    def images(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        base = rng.integers(0, 200, (self.n_persons, 4, 4, 3))
        out = np.zeros((len(self), self.image_size, self.image_size, 3), np.uint8)
        k = self.image_size // 4
        for i, p in enumerate(self.labels):
            pat = np.kron(base[p], np.ones((k, k, 1)))
            rand = rng.integers(0, 255, pat.shape)
            img = (1 - self.noise) * pat + self.noise * rand
            out[i] = np.clip(img, 0, 255).astype(np.uint8)
        return out


def person_splits(labels: np.ndarray, forget_size: int = 10, seed: int = 0) -> dict:
    """forget/retain/holdout splits, person-disjoint (prepare_vtofu analog).

    forget_size = percentage of identities forgotten; an equally-sized
    holdout is reserved for the attack's out-distribution.
    """
    persons = sorted(set(int(l) for l in labels))
    rng = random.Random(seed)
    shuffled = persons[:]
    rng.shuffle(shuffled)
    n_forget = max(1, len(persons) * forget_size // 100)
    forget_p = set(shuffled[:n_forget])
    holdout_p = set(shuffled[n_forget : 2 * n_forget])
    retain_p = set(shuffled[2 * n_forget :])

    idx = np.arange(len(labels))
    return {
        f"forget_{forget_size:02d}": idx[[l in forget_p for l in labels]].tolist(),
        f"retain_{100 - forget_size}": idx[[l in retain_p for l in labels]].tolist(),
        f"holdout_{forget_size:02d}": idx[[l in holdout_p for l in labels]].tolist(),
    }


def shadow_splits(
    labels: np.ndarray, base: dict, forget_size: int = 10, n_splits: int = 128,
    other_sample: int | None = None, seed: int = 0,
) -> list[dict]:
    """128 shadow training splits (cv/prepare_vtofu_dataset.py:105-166):
    splits 0..n/2-1 train WITH the forget identities, n/2..n-1 with the
    holdout identities instead; each samples a subset of the other persons.
    """
    rng = random.Random(seed)
    forget_idx = base[f"forget_{forget_size:02d}"]
    holdout_idx = base[f"holdout_{forget_size:02d}"]
    retain_idx = base[f"retain_{100 - forget_size}"]
    retain_persons = sorted(set(int(labels[i]) for i in retain_idx))
    k = other_sample if other_sample is not None else max(1, int(0.8 * len(retain_persons)))

    splits = []
    for s in range(n_splits):
        chosen = set(rng.sample(retain_persons, min(k, len(retain_persons))))
        others = [i for i in retain_idx if int(labels[i]) in chosen]
        include = forget_idx if s < n_splits // 2 else holdout_idx
        splits.append({"train": sorted(list(include) + others), "with_forget": s < n_splits // 2})
    return splits
