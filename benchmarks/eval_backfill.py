"""Backfill the held-out eval curve at EVERY persisted flagship checkpoint.

The flagship arms eval every 2000 steps but save every 1000 — and two host
re-images cost the live runs several logged eval points (PARITY.md
"Flagship run", metric-gap notes). This sweep restores each
``model_{step}/`` under a checkpoint dir in ascending order into ONE
trainer (eval program compiled once) and evaluates the same validation
stream the training loop uses (split="validation", seed+1 — matches
``pretrain.py``'s in-run eval exactly, same reservoir draws), so the
writeup gets a uniform 1000-step-resolution perplexity curve with no gaps
from resume boundaries onward.

Usage:
  python benchmarks/eval_backfill.py artifacts/flagship/linear_ckpt \
      [out.jsonl] [eval_tokens]
Prints one JSON line per checkpoint: {"step", "eval_loss", "perplexity"}.
Steps already present in out.jsonl are skipped (re-runnable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOTS = ["/opt/venv/lib/python3.12/site-packages", "/usr/lib/python3.11"]
TOK = "artifacts/bpe32k.json"


def main():
    ckpt_root = sys.argv[1] if len(sys.argv) > 1 else "artifacts/flagship/linear_ckpt"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    eval_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000

    dirs = sorted(
        (
            d
            for d in os.listdir(ckpt_root)
            if d.startswith("model_")
            and os.path.exists(os.path.join(ckpt_root, d, "training_state.json"))
        ),
        key=lambda d: int(d.split("_")[1]),
    )
    if not dirs:
        print(f"no checkpoints under {ckpt_root}", file=sys.stderr)
        return 1

    done = set()
    if out_path and os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(int(json.loads(line)["step"]))
                except (ValueError, KeyError):
                    pass

    from sow_tpu.checkpoint import restore_params
    from sow_tpu.data.local_text import load_local_tokenizer, local_text_batches
    from sow_tpu.train.trainer import TrainConfig, Trainer

    with open(os.path.join(ckpt_root, dirs[-1], "training_state.json")) as f:
        saved_cfg = json.load(f)["config"]
    names = {f.name for f in dataclasses.fields(TrainConfig)}
    cfg = TrainConfig(**{k: v for k, v in saved_cfg.items() if k in names})
    trainer = Trainer(cfg)
    tok = load_local_tokenizer(TOK)

    sink = open(out_path, "a") if out_path else None
    for d in dirs:
        step = int(d.split("_")[1])
        if step in done:
            continue
        params, _ = restore_params(trainer.params, os.path.join(ckpt_root, d))
        trainer.params = trainer._device_put_params(params)
        stream = local_text_batches(
            tok, ROOTS, split="validation", batch_size=cfg.batch_size,
            max_length=cfg.max_length, seed=cfg.seed + 1,
            cache_dir="artifacts/tokcache",
        )
        ev = trainer.evaluate(stream, max_tokens=eval_tokens)
        rec = {"step": step, "eval_loss": ev["eval_loss"],
               "perplexity": ev["perplexity"]}
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
    if sink:
        sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
