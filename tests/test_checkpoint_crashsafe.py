"""Crash-safety of the checkpoint stack (VERDICT r4 item 1).

Round 4's most expensive failure: a watchdog SIGKILL during the step-12000
save left a permanently-empty ``model_12000/`` that blind highest-number
selection then retried through 9 watchdog attempts x 3 auto-restarts,
while intact ``model_11000/`` sat beside it. These tests pin the three
fixes: atomic tmp-dir+rename saves, completeness-validated
``latest_checkpoint``/``complete_checkpoints``, and newest-first fallback
resume past broken dirs. The reference's saver/loader
(``simple_train.py:167-203,242-261``) has none of this — this repo must
exceed it because its own watchdog is the thing doing the killing.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from sow_tpu.checkpoint import (
    complete_checkpoints,
    is_complete_checkpoint,
    latest_checkpoint,
    save_checkpoint,
)
from sow_tpu.models import get_config, init_params

REPO = Path(__file__).resolve().parent.parent


def _params():
    return init_params(jax.random.PRNGKey(0), get_config("llama_test"))


class TestCompletenessValidation:
    def test_latest_skips_incomplete_dirs(self, tmp_path):
        d5 = save_checkpoint(str(tmp_path), 5, _params())
        # the round-4 wedge: an empty higher-numbered dir
        (tmp_path / "model_12").mkdir()
        # a partially-written dir (model file only, no training_state)
        partial = tmp_path / "model_20"
        partial.mkdir()
        (partial / "model.safetensors").write_bytes(b"x" * 100)
        # a zero-byte model file (kill during the very first write)
        trunc = tmp_path / "model_30"
        trunc.mkdir()
        (trunc / "model.safetensors").write_bytes(b"")
        (trunc / "training_state.json").write_text("{}")
        assert latest_checkpoint(str(tmp_path)) == d5
        assert complete_checkpoints(str(tmp_path)) == [d5]
        assert not is_complete_checkpoint(str(partial))
        assert not is_complete_checkpoint(str(trunc))

    def test_complete_checkpoints_newest_first(self, tmp_path):
        p = _params()
        d1 = save_checkpoint(str(tmp_path), 1, p)
        d3 = save_checkpoint(str(tmp_path), 3, p)
        d2 = save_checkpoint(str(tmp_path), 2, p)
        assert complete_checkpoints(str(tmp_path)) == [d3, d2, d1]

    def test_tmp_dirs_invisible_and_overwrite_cleans_debris(self, tmp_path):
        p = _params()
        # debris from a previous kill-mid-save at the same step
        debris = tmp_path / "model_7.tmp"
        debris.mkdir()
        (debris / "model.safetensors").write_bytes(b"junk")
        d7 = save_checkpoint(str(tmp_path), 7, p)
        assert not debris.exists()
        assert latest_checkpoint(str(tmp_path)) == d7
        assert is_complete_checkpoint(d7)


class TestKillMidSave:
    def test_crash_mid_save_leaves_no_visible_partial(self, tmp_path):
        """Hard-kill the process inside save_checkpoint (fault injection via
        SOW_CKPT_CRASH_AT_STEP) and prove the published namespace only ever
        contains complete checkpoints."""
        script = (
            "import jax, os\n"
            "from sow_tpu.checkpoint import save_checkpoint\n"
            "from sow_tpu.models import get_config, init_params\n"
            "p = init_params(jax.random.PRNGKey(0), get_config('llama_test'))\n"
            f"save_checkpoint({str(tmp_path)!r}, 10, p)\n"
            f"save_checkpoint({str(tmp_path)!r}, 20, p)\n"  # crashes here
            "print('UNREACHABLE')\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   SOW_CKPT_CRASH_AT_STEP="20")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run([sys.executable, "-c", script], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 117, r.stderr  # the injected hard-kill
        assert "UNREACHABLE" not in r.stdout
        # the in-flight step-20 save is only tmp debris; step 10 is intact
        assert (tmp_path / "model_20.tmp").is_dir()
        assert not (tmp_path / "model_20").exists()
        assert latest_checkpoint(str(tmp_path)) == str(tmp_path / "model_10")


@pytest.mark.slow
class TestPretrainCrashResume:
    def test_sigkill_mid_save_then_resume_lands_on_previous_complete(self, tmp_path):
        """End-to-end: trainer hard-killed during the step-20 save; the
        rerun with --continue-from must resume from step 10 (the previous
        complete checkpoint) and finish, publishing the final dir."""
        save = str(tmp_path / "ckpt")
        common = [
            sys.executable, "-m", "sow_tpu.train.pretrain",
            "--model", "llama_test", "--architecture", "sow", "--rank", "4",
            "--batch-size", "8", "--max-length", "16", "--dtype", "float32",
            "--sow-accumulation", "0", "--synthetic-data",
            "--num-training-steps", "30", "--lr", "1e-3",
            "--eval-every", "0", "--logging-steps", "10",
            "--save-dir", save, "--save-every", "10",
        ]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        env.pop("PALLAS_AXON_POOL_IPS", None)

        r1 = subprocess.run(common, cwd=REPO, capture_output=True, text=True,
                            env=dict(env, SOW_CKPT_CRASH_AT_STEP="20"),
                            timeout=600)
        assert r1.returncode == 117, r1.stderr
        assert latest_checkpoint(save) == os.path.join(save, "model_10")
        assert (Path(save) / "model_20.tmp").is_dir()  # the killed save

        r2 = subprocess.run(common + ["--continue-from", save], cwd=REPO,
                            env=env, capture_output=True, text=True,
                            timeout=600)
        assert r2.returncode == 0, r2.stderr
        assert f"resumed from {os.path.join(save, 'model_10')} at step 10" in r2.stdout
        assert is_complete_checkpoint(os.path.join(save, "model_30"))
        final = json.loads(r2.stdout.strip().splitlines()[-1])
        assert final["final_step"] == 30


@pytest.mark.slow
class TestResumeFallback:
    def test_resume_falls_back_past_corrupt_newest(self, tmp_path, capsys):
        """A checkpoint can be complete-looking yet unreadable (truncated
        safetensors header). Resume must fall back to the next-newest
        complete dir instead of dying — the round-4 auto-restart retried
        the same broken dir until it ran out of attempts."""
        from sow_tpu.train import pretrain

        save = str(tmp_path / "ckpt")
        argv = [
            "--model", "llama_test", "--architecture", "sow", "--rank", "4",
            "--batch-size", "8", "--max-length", "16", "--dtype", "float32",
            "--sow-accumulation", "0", "--synthetic-data",
            "--num-training-steps", "20", "--lr", "1e-3",
            "--eval-every", "0", "--logging-steps", "10",
            "--save-dir", save, "--save-every", "10",
        ]
        pretrain.main(argv)
        assert latest_checkpoint(save) == os.path.join(save, "model_20")

        # corrupt-but-complete-looking newest dir
        bad = Path(save) / "model_25"
        bad.mkdir()
        (bad / "model.safetensors").write_bytes(b"\xff" * 256)
        (bad / "training_state.json").write_text(json.dumps({"update_step": 25}))

        argv2 = [a if a != "20" else "30" for a in argv]
        pretrain.main(argv2 + ["--continue-from", save])
        out = capsys.readouterr().out
        assert "[resume-fallback] restore from" in out
        assert f"resumed from {os.path.join(save, 'model_20')} at step 20" in out
        assert is_complete_checkpoint(os.path.join(save, "model_30"))


class TestHeartbeat:
    def test_scope_beats_and_caps(self, tmp_path):
        import time

        from sow_tpu.utils.heartbeat import Heartbeat

        hb_path = str(tmp_path / "m.jsonl.hb")
        hb = Heartbeat(hb_path, interval=0.05, scope_cap=0.2)
        # no scope active -> no beats (a wedged training step must go stale)
        time.sleep(0.15)
        assert not os.path.exists(hb_path)
        with hb.scope("save@10"):
            time.sleep(0.12)
            assert os.path.exists(hb_path)
            assert "save@10" in open(hb_path).read()
            # past the cap the beats stop (a wedge INSIDE a save is still
            # caught, on the longer fuse): by 0.5s every in-flight beat has
            # either landed or been suppressed by the 0.2s cap check
            time.sleep(0.4)
            mt_capped = os.path.getmtime(hb_path)
            time.sleep(0.2)
            assert os.path.getmtime(hb_path) == mt_capped
        # after scope exit nothing beats
        mt = os.path.getmtime(hb_path)
        time.sleep(0.15)
        assert os.path.getmtime(hb_path) == mt
        hb.close()

    def test_none_path_is_noop(self):
        from sow_tpu.utils.heartbeat import Heartbeat

        hb = Heartbeat(None)
        with hb.scope("x"):
            pass
        hb.close()


class TestWatchdogHeartbeatAware:
    def test_slow_save_with_heartbeat_not_killed_hang_killed(self, tmp_path):
        """Fault-injection pair (VERDICT r4 item 6): a 'slow save' that
        beats the heartbeat survives a stale window that a silent hang of
        the same length does not."""
        wd = str(REPO / "benchmarks" / "watchdog_run.sh")
        env = dict(os.environ, WD_POLL="1", WD_RETRY_SLEEP="0")

        # slow save: no progress-file writes for ~4s (> STALE=2) but .hb
        # is touched -> must NOT be killed
        slow = tmp_path / "slow.sh"
        slow.write_text(
            "echo start >> prog.txt\n"
            "for i in 1 2 3 4; do sleep 1; echo beat > prog.txt.hb; done\n"
            "echo done >> prog.txt\nexit 0\n"
        )
        r = subprocess.run(
            ["bash", wd, "prog.txt", "2", "0", "-", "--", "bash", "slow.sh"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 0, r.stderr
        assert "killing" not in r.stderr

        # hang: same duration, no heartbeat -> killed, and the log says
        # what the last heartbeat was
        hang = tmp_path / "hang.sh"
        hang.write_text("echo start >> prog2.txt\nsleep 600\n")
        r2 = subprocess.run(
            ["bash", wd, "prog2.txt", "2", "0", "-", "--", "bash", "hang.sh"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=60,
        )
        assert r2.returncode != 0
        assert "killing pg" in r2.stderr
        assert "no heartbeat file" in r2.stderr
