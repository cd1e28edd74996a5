from multimodal_unlearning_tpu.parallel.ep import ep_degree, ep_shard_decoder
from multimodal_unlearning_tpu.parallel.mesh import MeshSpec, make_mesh
from multimodal_unlearning_tpu.parallel.pp import (
    pipeline_layers,
    pp_degree,
    pp_shard_decoder,
)
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
    "ep_degree",
    "ep_shard_decoder",
    "fsdp_sharding",
    "pipeline_layers",
    "pp_degree",
    "pp_shard_decoder",
    "replicated",
    "shard_pytree",
]
