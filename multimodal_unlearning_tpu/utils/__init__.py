from multimodal_unlearning_tpu.utils.pytree import (
    count_params,
    merge_trees,
    partition_tree,
    path_predicate,
    print_trainable_parameters,
)

__all__ = [
    "count_params",
    "merge_trees",
    "partition_tree",
    "path_predicate",
    "print_trainable_parameters",
]
