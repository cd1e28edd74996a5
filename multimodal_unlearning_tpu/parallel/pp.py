"""Pipeline parallelism over the ``pipe`` mesh axis (beyond-reference;
the reference's largest run is ZeRO-2 data parallelism — SURVEY.md §2.8).

GPipe-style microbatch pipelining, TPU-native: the decoder's *stacked* layer
dim (models/llama.py keeps all L layers as one [L, ...] tree) is sharded into
``pipe`` stages, so each device holds L/pipe contiguous layers.  A training
microbatch enters stage 0, flows stage-to-stage via neighbor
``jax.lax.ppermute`` (point-to-point over ICI — 'pipe' is the minor-most mesh
axis, parallel/mesh.py), and exits at the last stage.  With M microbatches the
schedule runs M + pipe − 1 ticks; the bubble fraction is
(pipe−1)/(M+pipe−1).

Everything is a pure function under one ``shard_map`` + ``lax.scan``:

- forward == the plain layer scan exactly (same math, same order — the
  per-stage inner scan composes to the full L-layer scan), so the pipeline is
  numerics-transparent and its gradients come from plain AD through the
  ``ppermute``s (the transpose of a permute is the inverse permute), with no
  hand-written schedule for the backward — XLA sees one differentiable
  program and pipelines the backward ticks the same way;
- per-sample tensors the layers need (rope tables, padding masks) travel
  *with* their microbatch through the ring, so each stage always applies the
  right rope/mask row to the activation it holds;
- the last stage's collected outputs are broadcast back over 'pipe' with a
  masked ``psum`` so the (replicated) lm_head/loss epilogue runs unchanged.

Composition: pipe × data/fsdp works out of the box (batch stays sharded over
('data','fsdp') inside the shard_map; layer-param cotangents psum over the
batch axes automatically).  pipe × tensor on the SAME weights is rejected —
inside a manual shard_map region the Megatron all-reduces would need
hand-written collectives; shard the decoder over 'pipe' OR 'tensor', not both.

Reference scope anchor: the reference trains 7B on multi-GPU DeepSpeed
(mm/forget.py:23-31); pipeline parallelism is what lets this framework place
models whose *weights* exceed one chip even at int8, without TP's per-matmul
all-reduce latency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pp_degree(mesh) -> int:
    """Size of the 'pipe' axis (1 when the mesh has no pipeline axis)."""
    try:
        return int(mesh.shape.get("pipe", 1)) if mesh is not None else 1
    except AttributeError:
        return 1


def resolve_microbatches(local_batch: int, pipe: int, requested=None) -> int:
    """Static microbatch count for the pipeline schedule.

    ``requested`` must divide the per-data-shard batch.  Default: the largest
    divisor of ``local_batch`` that is ≤ 2·pipe — enough microbatches to keep
    the bubble ≤ ⅓ without shrinking per-tick matmuls below MXU-friendly
    sizes.
    """
    if requested is not None:
        m = int(requested)
        if m < 1 or local_batch % m != 0:
            raise ValueError(
                f"pp_microbatches={m} must divide the per-shard batch {local_batch}"
            )
        return m
    best = 1
    for m in range(1, min(local_batch, 2 * pipe) + 1):
        if local_batch % m == 0:
            best = m
    return best


def pipeline_layers(
    block,
    x,
    layer_xs,
    extras,
    mesh: Mesh,
    *,
    num_microbatches=None,
    batch_axes=("data", "fsdp"),
):
    """Run a stacked-layer function as a GPipe pipeline over mesh axis 'pipe'.

    block(h, layer_inp, extras) -> h
        one decoder layer; ``layer_inp`` is one leading-dim slice of
        ``layer_xs``; ``extras`` is the microbatch's per-sample pytree.
    x: [B, ...] activations (batch sharded over ``batch_axes``).
    layer_xs: pytree with leading dim L on every leaf (layer ids, stacked
        layer params, stacked LoRA) — sharded over 'pipe'.
    extras: pytree of per-sample tensors with leading dim B (rope cos/sin,
        kv masks) that must travel with each microbatch.

    Returns x after all L layers, batch-sharded like the input and
    replicated over 'pipe'.
    """
    pipe = mesh.shape["pipe"]
    L = jax.tree.leaves(layer_xs)[0].shape[0]
    if L % pipe != 0:
        raise ValueError(f"num_layers {L} not divisible by pipe={pipe}")
    dp = 1
    for a in batch_axes:
        dp *= mesh.shape.get(a, 1)
    if x.shape[0] % dp != 0:
        raise ValueError(f"batch {x.shape[0]} not divisible by data shards {dp}")
    local_b = x.shape[0] // dp
    M = resolve_microbatches(local_b, pipe, num_microbatches)

    def nd_spec(leaf, lead):
        return P(lead, *([None] * (getattr(leaf, "ndim", 1) - 1)))

    xspec = nd_spec(x, batch_axes)
    layer_specs = jax.tree.map(lambda p: nd_spec(p, "pipe"), layer_xs)
    extras_specs = jax.tree.map(lambda e: nd_spec(e, batch_axes), extras)

    def body(x_loc, layers_loc, extras_loc):
        stage = jax.lax.axis_index("pipe")
        mb = local_b // M
        micro = x_loc.reshape(M, mb, *x_loc.shape[1:])
        micro_ex = jax.tree.map(
            lambda e: e.reshape(M, mb, *e.shape[1:]), extras_loc
        )

        def stage_fn(h, ex):
            def scan_body(h, inp):
                return block(h, inp, ex), None
            h, _ = jax.lax.scan(scan_body, h, layers_loc)
            return h

        def take(tree, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                tree,
            )

        perm = [(i, (i + 1) % pipe) for i in range(pipe)]

        def tick(carry, t):
            pkt_in, outputs = carry
            # stage 0 injects microbatch t (clamped re-injection after M is
            # never collected: it reaches the last stage after the final tick)
            inj = take((micro, micro_ex), jnp.minimum(t, M - 1))
            h, ex = jax.tree.map(
                lambda a, b: jnp.where(stage == 0, a, b), inj, pkt_in
            )
            y = stage_fn(h, ex)
            # the last stage finishes microbatch t-(pipe-1) at tick t
            idx = jnp.maximum(t - (pipe - 1), 0)
            prev = jax.lax.dynamic_index_in_dim(outputs, idx, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(t >= pipe - 1, y, prev), idx, 0
            )
            pkt_out = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "pipe", perm), (y, ex)
            )
            return (pkt_out, outputs), None

        pkt0 = jax.tree.map(jnp.zeros_like, take((micro, micro_ex), 0))
        (_, outputs), _ = jax.lax.scan(
            tick, (pkt0, jnp.zeros_like(micro)), jnp.arange(M + pipe - 1)
        )
        out = outputs.reshape(x_loc.shape)
        # broadcast the last stage's result over 'pipe' (masked psum) so the
        # epilogue (final norm + lm_head) runs replicated, like the plain scan
        return jax.lax.psum(
            jnp.where(stage == pipe - 1, out, jnp.zeros_like(out)), "pipe"
        )

    from jax import shard_map

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(xspec, layer_specs, extras_specs),
        out_specs=xspec,
        check_vma=False,
    )
    return fn(x, layer_xs, extras)


def decoder_pp_specs(params: dict) -> dict:
    """PartitionSpec tree: stacked layer leaves sharded over 'pipe' on the
    layer dim; embed/head/norm replicated (they run on every stage)."""
    def lead(p):
        if isinstance(p, dict):
            return {k: lead(v) for k, v in p.items()}
        return P("pipe", *([None] * (getattr(p, "ndim", 1) - 1)))

    def repl(p):
        if isinstance(p, dict):
            return {k: repl(v) for k, v in p.items()}
        return P(*([None] * getattr(p, "ndim", 1)))

    return {
        k: (lead(v) if k == "layers" else repl(v)) for k, v in params.items()
    }


def pp_shard_decoder(params: dict, mesh: Mesh):
    """Place a decoder param tree with its layer stack sharded over 'pipe'
    (each stage resident-holds only its own layers — the memory win that
    makes pipeline parallelism worth the bubble)."""
    specs = decoder_pp_specs(params)

    def place(p, spec):
        return None if p is None else jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=lambda x: x is None)
