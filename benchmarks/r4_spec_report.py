"""Merge the measured 9m->350m speculative-decoding run into the round-3
break-even ladder — prediction vs measurement at the scale where spec was
predicted to WIN (VERDICT r3 item 4).

Round-3 prediction (artifacts/spec_breakeven.json, latency-model
extrapolation from the trained 60m pair's acceptance profile):
9m->350m speedup at bs1: g2 1.2 / g4 1.11 / g6 1.04 on a dense target.

Usage: python benchmarks/r4_spec_report.py [spec_json]
Appends a {"metric": "spec_measured_350m", ...} line next to the
prediction in artifacts/spec_breakeven.json and prints the comparison.
"""

from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/r4/spec_350m.json"
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        print("no spec rows")
        return

    pred = None
    ladder = []
    try:
        with open("artifacts/spec_breakeven.json") as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    ladder.append(rec)
                    if (rec.get("metric") == "spec_breakeven"
                            and rec.get("draft") == "llama_9m"
                            and rec.get("target") == "llama_350m"):
                        pred = rec
    except FileNotFoundError:
        pass

    print("measured 9m -> 350m speculative decoding:")
    summary = {"metric": "spec_measured_350m", "rows": rows}
    for r in rows:
        print(" ", json.dumps(r))
    if pred:
        print("\nround-3 prediction for this pair:",
              json.dumps({k: pred[k] for k in ("latency_ratio",
                                               "speedup@linear@bs1") if k in pred}))
    with open("artifacts/spec_breakeven.json", "a") as f:
        f.write(json.dumps(summary) + "\n")
    print("\nappended spec_measured_350m to artifacts/spec_breakeven.json")


if __name__ == "__main__":
    main()
