"""W4 eval harness over PRETRAIN checkpoints (--checkpoint-arch).

The reference's eval consumes finetuned adapters; round 4 adds scoring a
``train/pretrain.py`` checkpoint directly (the flagship 60m path:
generate -> response split -> regex extract -> accuracy), engine-identical
between fixed-batch and the continuous server."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_eval_cli_scores_pretrain_sow_checkpoint(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    train = subprocess.run(
        [sys.executable, "-m", "sow_tpu.train.pretrain",
         "--model", "llama_test", "--architecture", "sow", "--rank", "2",
         "--sow-accumulation", "3", "--num-training-steps", "4",
         "--batch-size", "4", "--max-length", "16", "--synthetic-data",
         "--eval-every", "0", "--save-dir", ckpt, "--save-every", "4"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert train.returncode == 0, train.stdout[-2000:] + train.stderr[-2000:]

    accs = {}
    for engine in ("batch", "server"):
        r = subprocess.run(
            [sys.executable, "-m", "sow_tpu.eval.commonsense_eval",
             "--dataset", "tests/fixtures/arc_easy_test.json",
             "--checkpoint", ckpt, "--checkpoint-arch", "sow", "--rank", "2",
             "--base-model", "llama_test", "--tokenizer", "byte",
             "--batch-size", "2", "--max-new-tokens", "8", "--num-beams", "1",
             "--engine", engine],
            cwd=REPO, env=_env(), capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, f"{engine}:\n{r.stdout[-2000:]}{r.stderr[-2000:]}"
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert "accuracy" in out and out["n"] > 0
        accs[engine] = out["accuracy"]
    # the two engines decode token-identically -> identical accuracy
    assert accs["batch"] == accs["server"], accs
