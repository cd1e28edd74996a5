from multimodal_unlearning_tpu.parallel.mesh import MeshSpec, make_mesh
from multimodal_unlearning_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_sharding,
    replicated,
    shard_pytree,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "fsdp_sharding",
    "replicated",
    "shard_pytree",
]
