"""multimodal_unlearning_tpu — TPU-native multimodal unlearning framework.

A from-scratch JAX/XLA/Pallas re-design of the CLEAR multimodal-unlearning
stack (reference: somvy/multimodal_unlearning).  Three experiment stacks share
one substrate:

- ``mm``  — multimodal (LLaVA-class VLM) unlearning          (reference mm/)
- ``nlp`` — text-only decoder unlearning                      (reference nlp/)
- ``cv``  — vision-only face-recognition unlearning + MIA     (reference cv/)

Design pillars (TPU-first, not a port):

- pure-functional models (param pytrees), everything jit-compiled;
- Pallas flash-attention kernels for both towers;
- ``jax.sharding.Mesh('data','fsdp','tensor')`` + NamedSharding replaces
  accelerate/DeepSpeed: grads reduce-scatter over ICI, optimizer state
  sharded ZeRO-style, teacher params FSDP-sharded;
- fixed shapes end-to-end (bucketed collators, masked image-token splice);
- host-side config system mirroring the reference's Hydra surface.
"""

__version__ = "0.1.0"
