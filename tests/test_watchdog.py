"""Pin benchmarks/watchdog_run.sh — the hang watchdog that guards long chip
runs (a wedged tunnel call blocks forever with no exception; the in-process
``--auto-restart`` cannot catch it, so an external monitor on the run's
metrics file is the only recovery)."""

import os
import subprocess
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WD = str(REPO / "benchmarks" / "watchdog_run.sh")


def _run(args, cwd, timeout=60):
    env = dict(os.environ, WD_POLL="1", WD_RETRY_SLEEP="0")
    return subprocess.run(
        ["bash", WD, *args], cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def test_healthy_run_passes_through_exit_status(tmp_path):
    t0 = time.time()
    r = _run(
        ["prog.txt", "30", "2", "-", "--", "bash", "-c",
         "echo 1 >> prog.txt; exit 0"],
        cwd=tmp_path,
    )
    assert r.returncode == 0
    assert time.time() - t0 < 30  # noticed the exit promptly, not after STALE
    assert "killing" not in r.stderr


def test_hang_is_killed_and_retried_then_gives_up(tmp_path):
    (tmp_path / "hang.sh").write_text("echo tick >> prog.txt\nsleep 600\n")
    r = _run(["prog.txt", "2", "1", "-", "--", "bash", "hang.sh"], cwd=tmp_path)
    assert r.returncode != 0
    assert r.stderr.count("killing pg") == 2  # initial + one retry
    assert "giving up" in r.stderr


def test_retry_resumes_from_checkpoint_dir(tmp_path):
    # first attempt writes progress then hangs; a checkpoint dir exists, so
    # the rerun must get --continue-from and (here) succeed immediately
    (tmp_path / "ckpt" / "model_5").mkdir(parents=True)
    (tmp_path / "resumable.sh").write_text(
        'echo tick >> prog.txt\n'
        'if [ "${1:-}" = "--continue-from" ]; then echo "RESUMED $2" >> prog.txt; exit 0; fi\n'
        "sleep 600\n"
    )
    r = _run(["prog.txt", "2", "2", "ckpt", "--", "bash", "resumable.sh"],
             cwd=tmp_path)
    assert r.returncode == 0
    assert "RESUMED ckpt" in (tmp_path / "prog.txt").read_text()


def test_failing_command_reruns_without_resume_dir(tmp_path):
    # non-zero exit (not a hang) also retries; with RESUME=- no flag is added
    (tmp_path / "flaky.sh").write_text(
        'echo t >> prog.txt\n'
        '[ -f once ] && exit 0\n'
        "touch once; exit 3\n"
    )
    r = _run(["prog.txt", "30", "2", "-", "--", "bash", "flaky.sh"], cwd=tmp_path)
    assert r.returncode == 0
    assert "attempt 1/2" in r.stderr
