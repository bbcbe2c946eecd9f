"""Summarize flagship-run metrics JSONL into the PARITY.md table.

Usage: python benchmarks/flagship_report.py artifacts/flagship
Reads {linear,sow}.jsonl written by the pretrain CLI's MetricsLogger and
prints a markdown table of held-out eval loss / perplexity over training
(the curve the reference prints at eval_every, simple_train.py:121-164).
"""

from __future__ import annotations

import json
import sys


def load(path):
    train, evals = [], []
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "eval_loss" in rec:
                    evals.append(rec)
                elif "loss" in rec:
                    train.append(rec)
    except FileNotFoundError:
        pass
    return train, evals


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/flagship"
    runs = {}
    for arch in ("linear", "sow"):
        train, evals = load(f"{out}/{arch}.jsonl")
        if train or evals:
            runs[arch] = (train, evals)
    if not runs:
        print(f"no metrics under {out}")
        return

    steps = sorted({e["step"] for _, ev in runs.values() for e in ev})
    cols = list(runs)
    print("| step | " + " | ".join(f"{a} eval loss | {a} ppl" for a in cols) + " |")
    print("|---" * (1 + 2 * len(cols)) + "|")
    for s in steps:
        row = [str(s)]
        for a in cols:
            ev = {e["step"]: e for e in runs[a][1]}
            if s in ev:
                row += [f"{ev[s]['eval_loss']:.4f}", f"{ev[s]['perplexity']:.2f}"]
            else:
                row += ["-", "-"]
        print("| " + " | ".join(row) + " |")

    for a in cols:
        train, ev = runs[a]
        if train:
            last = train[-1]
            tps = [r.get("tokens_per_sec", 0) for r in train[len(train) // 2 :]]
            print(
                f"{a}: last train step {last['step']} loss {last['loss']:.4f}; "
                f"median tokens/s {sorted(tps)[len(tps) // 2]:,.0f}"
            )

    # time-to-quality: first eval step at which each run reaches the OTHER
    # run's final eval loss (the SoW-vs-dense capacity story in one number)
    if len(runs) == 2 and all(ev for _, ev in runs.values()):
        a, b = cols
        for x, y in ((a, b), (b, a)):
            target = runs[y][1][-1]["eval_loss"]
            hit = next((e["step"] for e in runs[x][1] if e["eval_loss"] <= target), None)
            where = f"step {hit}" if hit is not None else "never"
            print(f"{x} reaches {y}'s final eval loss ({target:.4f}): {where}")


if __name__ == "__main__":
    main()
