"""Host-side training loop shared by finetune/forget entry points.

Mirrors the reference step math (mm/forget.py:65-68: steps_per_epoch and
max_steps from dataset length, batch size, grad accum, world size; warmup =
one epoch at mm/forget.py:147) on top of the compiled train step.
"""

from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_unlearning_tpu.data.loader import stack_microbatches
from multimodal_unlearning_tpu.parallel.sharding import batch_sharding


def compute_steps(n_samples: int, batch_size: int, grad_accum: int, num_devices: int, num_epochs: float):
    denom = batch_size * grad_accum * num_devices
    steps_per_epoch = n_samples // denom
    max_steps = int(num_epochs * n_samples) // denom
    return steps_per_epoch, max_steps


def train_loop(
    *,
    train_step,
    state,
    frozen,
    teacher_params,
    dataloader,
    mesh,
    grad_accum: int,
    max_steps: int,
    logging_steps: int = 10,
    on_save=None,
    save_steps: int | None = None,
    profile_dir: str | None = None,
    state_ckpt_dir: str | None = None,
    resume: bool = False,
    ckpt_async: bool = True,
    ckpt_keep: int | None = None,
):
    """Runs until max_steps; returns (state, history).

    ``state_ckpt_dir``: Orbax full-train-state checkpoints every
    ``save_steps`` (resume path incl. optimizer moments — the vendored HF
    loop's resume analog, nlp/grad_proj.py:271-321); ``resume=True``
    restores the latest before training.  ``ckpt_async`` overlaps the
    Orbax write with training (only the device->host snapshot blocks);
    ``ckpt_keep`` prunes to the newest N step dirs (HF save_total_limit
    analog)."""
    from multimodal_unlearning_tpu.train import checkpoints as ckpt_mod

    start_step = 0
    skip_batches = 0
    if resume and state_ckpt_dir:
        latest = ckpt_mod.latest_train_state_step(state_ckpt_dir)
        if latest is not None:
            state = ckpt_mod.restore_train_state(state_ckpt_dir, latest, state)
            start_step = latest
            # Replay the data order exactly (HF Trainer's RNG-restore +
            # batch-skipping analog, nlp/grad_proj.py:271-321): the loader's
            # shuffle is seeded per epoch, so restoring its epoch counter and
            # skipping the already-consumed batches of the partial epoch makes
            # the resumed loss trajectory identical to an uninterrupted run.
            steps_per_pass = len(dataloader)
            if steps_per_pass and hasattr(dataloader, "epoch"):
                dataloader.epoch = start_step // steps_per_pass
                skip_batches = start_step % steps_per_pass
            print(f"Resumed train state from step {latest}")
    if grad_accum > 1:
        bsh = NamedSharding(mesh, P(None, ("data", "fsdp")))
        batch_axis = 1
    else:
        bsh = batch_sharding(mesh)
        batch_axis = 0

    nproc, pidx = jax.process_count(), jax.process_index()

    def put(batch):
        if nproc > 1:
            # Multi-host global-batch assembly: every process loads the same
            # (seed-deterministic) global batch, keeps its contiguous row
            # block, and contributes it as the process-local shard
            # (accelerate/DDP analog of the reference's per-rank loaders,
            # mm/forget.py:23-31).
            def shard(x):
                x = np.asarray(x)
                n = x.shape[batch_axis] // nproc
                local = np.take(
                    x, np.arange(pidx * n, (pidx + 1) * n), axis=batch_axis
                )
                return jax.make_array_from_process_local_data(bsh, local)

            return jax.tree.map(shard, batch)
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), bsh), batch)

    if len(dataloader) == 0:
        raise ValueError(
            f"Dataset yields zero batches: {len(dataloader.dataset)} samples < "
            f"global batch {dataloader.batch_size} — shrink batch/devices or grow data"
        )
    step_i = start_step
    history = []
    ckptr = None
    t0 = time.perf_counter()
    tokens_seen = 0
    while step_i < max_steps:
        for batch in dataloader:
            if skip_batches:  # consumed before the resume point
                skip_batches -= 1
                continue
            if step_i >= max_steps:
                break
            if profile_dir and step_i == 2:
                jax.profiler.start_trace(profile_dir)
            if grad_accum > 1:
                batch = stack_microbatches(batch, grad_accum)
            for part in batch.values():
                ids = part["input_ids"]
                tokens_seen += int(np.prod(ids.shape))
            state, metrics = train_step(state, frozen, teacher_params, put(batch))
            step_i += 1
            if profile_dir and step_i == 5:
                jax.block_until_ready(state.trainable)
                jax.profiler.stop_trace()
            if logging_steps and (step_i % logging_steps == 0 or step_i == 1):
                loss = float(metrics["loss"])
                dt = time.perf_counter() - t0
                print(
                    f"step {step_i}/{max_steps}  loss {loss:.4f}  "
                    f"{step_i / dt:.3f} steps/s  {tokens_seen / dt:.0f} tok/s",
                    flush=True,
                )
                history.append({"step": step_i, "loss": loss})
            if save_steps and step_i % save_steps == 0 and step_i < max_steps:
                if on_save:
                    on_save(state, step_i)
                if state_ckpt_dir:
                    if ckptr is None:
                        ckptr = ckpt_mod.TrainStateCheckpointer(
                            state_ckpt_dir, async_save=ckpt_async,
                            keep_last=ckpt_keep)
                    ckptr.save(step_i, state)
    jax.block_until_ready(state.trainable)
    if ckptr is not None:
        ckptr.wait()  # drain the in-flight async write before returning
    return state, history
