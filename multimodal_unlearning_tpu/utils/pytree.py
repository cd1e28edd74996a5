"""Parameter-pytree utilities: partition/merge, counting, freezing.

Replaces torch's ``requires_grad`` mechanics (reference: utils.py:22-37,
mm/finetune.py:104-105): trainability is expressed by *partitioning* the
param tree into (trainable, frozen) subtrees keyed by path predicates, so
``jax.grad`` differentiates exactly the trainable subtree — frozen params
never get a gradient buffer at all (cheaper than masking).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def path_predicate(*substrings: str) -> Callable[[str], bool]:
    """Predicate matching any path containing one of the substrings."""
    return lambda path: any(s in path for s in substrings)


def partition_tree(tree, predicate: Callable[[str], bool]):
    """Split a pytree into (matching, rest); non-matching slots become None."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    match_leaves, rest_leaves = [], []
    for path, leaf in flat:
        if predicate(_path_str(path)):
            match_leaves.append(leaf)
            rest_leaves.append(None)
        else:
            match_leaves.append(None)
            rest_leaves.append(leaf)
    return (
        jax.tree_util.tree_unflatten(treedef, match_leaves),
        jax.tree_util.tree_unflatten(treedef, rest_leaves),
    )


def merge_trees(a, b):
    """Merge two same-structure trees where exactly one side is non-None."""
    return jax.tree.map(
        lambda x, y: x if x is not None else y,
        a,
        b,
        is_leaf=lambda x: x is None,
    )


def count_params(tree) -> int:
    return sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape")
    )


def print_trainable_parameters(trainable, frozen) -> str:
    """Reference parity: utils.py:27-37."""
    t, f = count_params(trainable), count_params(frozen)
    total = t + f
    msg = (
        f"trainable params: {t} || all params: {total} || "
        f"trainable%: {100 * t / max(total, 1)}"
    )
    print(msg)
    return msg
