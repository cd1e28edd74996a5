"""2-process multi-host simulation on CPU: jax.distributed over localhost,
4 virtual devices per process (8 global), the full mm_forget CLI as the
workload — validates coordinator bootstrap (cli/common.py
maybe_init_distributed), global-batch assembly via
make_array_from_process_local_data (train/loop.py), and the single-writer
save guard.  The reference's analog is `accelerate launch` DDP
(mm/forget.py:23-31, README.md:57)."""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mm_forget(tmp_path):
    port = _free_port()
    save = tmp_path / "mh"
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            MMU_COORDINATOR=f"localhost:{port}",
            MMU_NUM_PROCESSES="2",
            MMU_PROCESS_ID=str(rank),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "multimodal_unlearning_tpu.cli.mm_forget",
             "model_family=tiny-llava-test", "model_path=random-init",
             "forget_data_path=synthetic:n_persons=40,qa_per_person=8",
             "retain_data_path=synthetic:n_persons=40,qa_per_person=8",
             "forget_loss=grad_diff_forget_ce_retain_ce",
             "batch_size=1", "gradient_accumulation_steps=2", "num_epochs=1",
             "max_length=128", "dtype=float32", f"save_dir={save}",
             "overwrite_dir=true"],
            env=env, cwd=str(REPO), text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # both ranks computed the SAME global loss trajectory
    loss_re = re.compile(r"step \d+/\d+\s+loss (-?\d+\.\d+)")
    losses = [loss_re.findall(out) for out in outs]
    assert losses[0] and losses[0] == losses[1], f"loss mismatch: {losses}"

    # single-writer save: exactly one model file, written by rank 0
    assert (save / "model.safetensors").exists()
