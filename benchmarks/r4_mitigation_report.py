"""Summarize the round-4 flagship mitigation arms against the round-3
baseline — the measured answer to "can the reference's own knobs close the
SoW quality gap?" (VERDICT r3 item 1).

Arms (benchmarks/r4_mitigation_chain.sh), both resumed from the surviving
step-9000 SoW checkpoint and run to 25k on the identical config:
  nolatefold — --sow-accum-end-frac 0.7 (skip the measured-harmful 20k fold)
  resetsched — --reset-scheduler (per-cycle sow_lr cosine restarts,
               ref simple_train.py:516-523)
Baselines (round 3, artifacts/flagship): dense 1.5019 / ppl 4.49,
SoW 1.6154 / ppl 5.03; the SoW arm's pre-fold best was 1.6047 / 4.98 @20k.

Usage: python benchmarks/r4_mitigation_report.py [dir]
Prints a markdown eval-curve table + final comparison lines.
"""

from __future__ import annotations

import json
import math
import os
import sys

BASELINE = {"linear": 1.5019, "sow": 1.6154, "sow_best_prefold": 1.6047}


def eval_curve(path: str) -> dict[int, float]:
    out = {}
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "eval_loss" in rec:
                    out[rec["step"]] = rec["eval_loss"]
    except FileNotFoundError:
        pass
    return out


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/flagship_r4"
    arms = {}
    for arm in ("nolatefold", "resetsched"):
        c = eval_curve(os.path.join(out, f"{arm}.jsonl"))
        if c:
            arms[arm] = c
    if not arms:
        print(f"no arm metrics under {out}")
        return
    r3 = eval_curve("artifacts/flagship/sow.jsonl")

    steps = sorted({s for c in arms.values() for s in c} | {s for s in r3 if s >= 10000})
    print("| step | r3 sow (baseline) | " + " | ".join(arms) + " |")
    print("|" + "---|" * (2 + len(arms)))
    for s in steps:
        cells = [f"{r3.get(s, float('nan')):.4f}" if s in r3 else "-"]
        for arm in arms:
            cells.append(f"{arms[arm][s]:.4f}" if s in arms[arm] else "-")
        print(f"| {s} | " + " | ".join(cells) + " |")

    print()
    for arm, c in arms.items():
        last_step = max(c)
        final = c[last_step]
        d_sow = final - BASELINE["sow"]
        d_best = final - BASELINE["sow_best_prefold"]
        d_dense = final - BASELINE["linear"]
        print(
            f"{arm}: final eval {final:.4f} (ppl {math.exp(final):.2f}) @ step {last_step} | "
            f"vs r3 sow 5.03: {d_sow:+.4f} | vs pre-fold best 4.98: {d_best:+.4f} | "
            f"gap to dense: {d_dense:+.4f} (r3 gap was +0.1135)"
        )


if __name__ == "__main__":
    main()
