"""Device-mesh construction.

The reference's process topology is env-driven DDP + DeepSpeed ZeRO-2 over
NCCL (reference: mm/forget.py:23-31, config/ds_config.json:2).  The TPU-native
analog is a single ``jax.sharding.Mesh`` with three axes:

- ``data``   — pure data parallelism (DDP analog); gradients psum over ICI.
- ``fsdp``   — parameter/optimizer-state sharding axis (ZeRO-1/2/3 analog);
               batch is also split over it, so ``data × fsdp`` is the global
               data-parallel degree, and XLA lowers grad reduction over
               ``fsdp`` to reduce-scatter exactly like ZeRO-2's
               ``overlap_comm`` path.
- ``seq``    — sequence/context parallelism: activations sharded along the
               sequence dim, attention via the ring kernel
               (ops/ring_attention.py) with neighbor ppermutes over ICI
               (absent in the reference; first-class here).
- ``tensor`` — tensor parallelism for attention heads / MLP hidden
               (absent in the reference; first-class here).
- ``pipe``   — pipeline parallelism: the decoder's stacked layer dim is
               sharded into stages, microbatches flow stage-to-stage via
               neighbor ``ppermute`` (parallel/pp.py; absent in the
               reference; first-class here).

Axis sizes come from config
(``mesh: {data: -1, fsdp: 1, seq: 1, tensor: 1, pipe: 1}``);
``-1`` absorbs all remaining devices.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh

# 'pipe' is the minor-most axis so pipeline neighbors sit on adjacent ICI
# links (stage hand-offs are point-to-point ppermutes); 'expert' (MoE expert
# parallelism, ops/moe.py) sits next to 'tensor' so its dispatch/combine
# collectives also ride short paths
AXES = ("data", "fsdp", "seq", "expert", "tensor", "pipe")


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1
    fsdp: int = 1
    seq: int = 1
    tensor: int = 1
    pipe: int = 1
    expert: int = 1

    @classmethod
    def from_config(cls, cfg) -> "MeshSpec":
        if cfg is None:
            return cls()
        get = cfg.get if hasattr(cfg, "get") else lambda k, d: getattr(cfg, k, d)
        return cls(
            data=int(get("data", -1)),
            fsdp=int(get("fsdp", 1)),
            seq=int(get("seq", 1)),
            tensor=int(get("tensor", 1)),
            pipe=int(get("pipe", 1)),
            expert=int(get("expert", 1)),
        )

    def resolve(self, n_devices: int) -> tuple[int, ...]:
        # AXES order: (data, fsdp, seq, expert, tensor, pipe)
        sizes = [self.data, self.fsdp, self.seq, self.expert, self.tensor, self.pipe]
        n_wild = sizes.count(-1)
        if n_wild > 1:
            raise ValueError("At most one mesh axis may be -1")
        fixed = int(np.prod([s for s in sizes if s != -1]))
        if n_wild == 1:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by fixed axes {fixed}")
            sizes[sizes.index(-1)] = n_devices // fixed
        if int(np.prod(sizes)) != n_devices:
            raise ValueError(f"Mesh {sizes} does not cover {n_devices} devices")
        return tuple(sizes)  # type: ignore[return-value]


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build the global mesh.

    Device order follows ``jax.devices()`` so the fastest-varying axis
    (``tensor``) maps to nearest-neighbor ICI links, then ``fsdp``, then
    ``data`` — collective-heavy axes ride the shortest paths.
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    sizes = spec.resolve(len(devices))
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, AXES)
