"""Multi-process SPMD execution (SURVEY §2.4 — the torchrun/DDP equivalence).

The reference validates its multi-process path only by running real
torchrun jobs; here N coordinated CPU processes (each with K virtual
devices) run the REAL pretraining CLI over one global 2x4-process mesh and
must reproduce the single-process 8-device loss trajectory exactly — the
strongest cross-process correctness check available without hardware.
"""

import json
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = [
    "--model", "llama_test", "--architecture", "sow", "--rank", "2",
    "--sow-accumulation", "3", "--num-training-steps", "6",
    "--batch-size", "8", "--max-length", "16", "--synthetic-data",
    "--logging-steps", "1", "--eval-every", "0", "--dtype", "float32",
    "--mesh-fsdp", "2",
]


def _env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


def _losses(stdout: str) -> list:
    return [float(m) for m in re.findall(r"loss (\d+\.\d+)", stdout)]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    ckpt = str(tmp_path / "mh_ckpt")
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "sow_tpu.train.pretrain", *ARGS,
            "--save-dir", ckpt, "--save-every", "6",
            "--multihost-coordinator", f"127.0.0.1:{port}",
            "--multihost-num-processes", "2",
            "--multihost-process-id", str(pid),
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=_env(4), text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank {procs.index(p)} failed:\n{out[-4000:]}"

    # process 0 owns logging; crossed the step-3 SoW accumulation event
    multi_losses = _losses(outs[0])
    assert len(multi_losses) == 6
    assert '"final_step": 6' in outs[0]
    assert _losses(outs[1]) == []  # non-primary stays silent
    # checkpoint save path: collective process_allgather, process-0 write
    saved = os.listdir(os.path.join(ckpt, "model_6"))
    assert "model.safetensors" in saved and "training_state.json" in saved

    # single-process 8-device reference: identical trajectory (the mesh and
    # per-device shards are the same; only the controller count differs)
    ref = subprocess.run(
        [sys.executable, "-m", "sow_tpu.train.pretrain", *ARGS],
        cwd=REPO, env=_env(8), text=True, capture_output=True, timeout=900,
    )
    assert ref.returncode == 0, ref.stdout[-4000:] + ref.stderr[-2000:]
    ref_losses = _losses(ref.stdout)
    assert len(ref_losses) == 6
    for a, b in zip(multi_losses, ref_losses):
        assert abs(a - b) <= 2e-4 * max(abs(b), 1.0), (multi_losses, ref_losses)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_pair(ckpt, steps, port, extra=()):
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "sow_tpu.train.pretrain", *ARGS,
            "--num-training-steps", str(steps),
            "--save-dir", ckpt, "--save-every", "3",
            "--multihost-coordinator", f"127.0.0.1:{port}",
            "--multihost-num-processes", "2",
            "--multihost-process-id", str(pid),
            *extra,
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=_env(4), text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    return procs


@pytest.mark.slow
def test_multihost_kill_one_process_then_resume(tmp_path):
    """VERDICT r4 item 7 — multihost resume. A host fleet loses a process
    mid-run (re-images are a documented fact of life); the relaunched fleet
    must resume from the latest complete checkpoint and produce the same
    trajectory a single-process resume from that checkpoint produces.
    Matches the reference's per-rank torchrun resume
    (``simple_train.py:537-564``)."""
    import shutil
    import time

    from sow_tpu.checkpoint import complete_checkpoints, is_complete_checkpoint

    ckpt = str(tmp_path / "mh_ckpt")

    # phase A: clean 2-process run to step 6 (checkpoints at 3 and 6)
    procs = _launch_pair(ckpt, 6, _free_port())
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert complete_checkpoints(ckpt)[0].endswith("model_6")

    # phase B: continue toward 12, then hard-kill ONE process mid-run (the
    # re-imaged host). The survivor is reaped after a grace period, as a
    # real job scheduler would.
    procs = _launch_pair(ckpt, 12, _free_port(), extra=("--continue-from", ckpt))
    time.sleep(10)  # let them rendezvous and take some steps
    procs[1].kill()
    try:
        procs[0].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        procs[0].communicate()
    procs[1].communicate()
    # atomic saves: whatever happened, no partial dir is ever visible
    for name in os.listdir(ckpt):
        if re.fullmatch(r"model_\d+", name):
            assert is_complete_checkpoint(os.path.join(ckpt, name)), name
    resume_from = complete_checkpoints(ckpt)[0]
    resume_step = int(resume_from.rsplit("_", 1)[1])
    assert resume_step >= 6

    # single-process reference resume needs the PRE-relaunch dir state
    ref_ckpt = str(tmp_path / "ref_ckpt")
    shutil.copytree(ckpt, ref_ckpt)

    # phase C: relaunch the fleet; it must resume and finish
    procs = _launch_pair(ckpt, 12, _free_port(), extra=("--continue-from", ckpt))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert f"resumed from {resume_from} at step {resume_step}" in outs[0]
    assert '"final_step": 12' in outs[0]
    assert is_complete_checkpoint(os.path.join(ckpt, "model_12"))
    multi_losses = _losses(outs[0])

    # phase D: single-process 8-device resume from the same checkpoint —
    # identical post-resume trajectory
    ref = subprocess.run(
        [sys.executable, "-m", "sow_tpu.train.pretrain", *ARGS,
         "--num-training-steps", "12", "--continue-from", ref_ckpt],
        cwd=REPO, env=_env(8), text=True, capture_output=True, timeout=900,
    )
    assert ref.returncode == 0, ref.stdout[-4000:] + ref.stderr[-2000:]
    ref_losses = _losses(ref.stdout)
    assert len(multi_losses) == len(ref_losses) == 12 - resume_step
    for a, b in zip(multi_losses, ref_losses):
        assert abs(a - b) <= 2e-4 * max(abs(b), 1.0), (multi_losses, ref_losses)
