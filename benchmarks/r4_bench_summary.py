"""Aggregate every round-4 measured artifact into one markdown summary
(the BENCH_HISTORY section source).

Usage: python benchmarks/r4_bench_summary.py > /tmp/r4_summary.md
Reads artifacts/flagship_r4, artifacts/conv9m, artifacts/r4/*.json and the
two dedicated reports; prints markdown. Sections whose artifacts are
missing are skipped with a note, so this can run mid-queue.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def run_report(script, *args):
    r = subprocess.run([sys.executable, script, *args],
                       capture_output=True, text=True)
    return r.stdout.strip()


def jlines(path):
    out = []
    try:
        with open(path) as f:
            for line in f:
                if line.strip():
                    out.append(json.loads(line))
    except FileNotFoundError:
        pass
    return out


def main():
    print("## Round 4 — measured results\n")

    print("### Flagship SoW quality-gap mitigations (VERDICT item 1)\n")
    rep = run_report("benchmarks/r4_mitigation_report.py")
    print(rep or "_mitigation arms not finished yet_")
    print()

    print("### conv9m: TT-Adam trains a model + factor warm-start (items 2, 6)\n")
    rep = run_report("benchmarks/conv9m_report.py")
    print(rep or "_conv9m round-4 runs missing_")
    print()

    print("### Speculative decoding, measured at 350m (item 4)\n")
    spec = jlines("artifacts/r4/spec_350m.json")
    if spec:
        for r in spec:
            print("  -", json.dumps(r))
    else:
        print("_spec_350m.json missing_")
    print()

    print("### Online serving (item 5)\n")
    rows = jlines("artifacts/r4/serve_online.json") + jlines(
        "artifacts/r4/serve_online_burst.json")
    if rows:
        cols = ("engine", "arrival_rate", "burst", "tokens_per_s",
                "ttft_p50_s", "ttft_p95_s", "latency_p50_s", "latency_p95_s",
                "latency_p99_s")
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for r in rows:
            print("| " + " | ".join(str(r.get(c, "-")) for c in cols) + " |")
    else:
        print("_online serving results missing_")
    print()

    print("### W4 accuracy (item 3)\n")
    accs = sorted(glob.glob("artifacts/r4/acc_*.json"))
    if accs:
        print("| engine/beams | accuracy | n |")
        print("|---|---|---|")
        for p in accs:
            rows = jlines(p)
            if rows:
                r = rows[-1]
                name = os.path.basename(p)[4:-5]
                print(f"| {name} | {r.get('accuracy')} | {r.get('n')} |")
    else:
        print("_accuracy runs missing_")
    print()

    print("### GLUE sweep with a non-degenerate objective (item 7)\n")
    for arm in ("baseline", "random", "tpe"):
        rows = jlines(f"artifacts/r4/glue_{arm}.jsonl")
        if not rows:
            print(f"- {arm}: _missing_")
            continue
        key = lambda r: max(r["eval"].get("accuracy", 0.0),
                            r["eval"].get("matthews_correlation", 0.0))
        best = max(rows, key=key)
        print(f"- {arm}: {len(rows)} trials; best eval {best['eval']} "
              f"(combo {best['combo']})")
    print()

    print("### 350m / draft pretrains (spec prerequisites)\n")
    for name in ("350m", "draft9m"):
        rows = jlines(f"artifacts/r4/{name}.jsonl")
        losses = [r for r in rows if "loss" in r and "eval_loss" not in r]
        evals = [r for r in rows if "eval_loss" in r]
        if losses:
            last = losses[-1]
            line = (f"- {name}: step {last['step']} train loss "
                    f"{last['loss']:.4f}, {last.get('tokens_per_sec', 0):,.0f} tok/s")
            if evals:
                line += f"; final eval loss {evals[-1]['eval_loss']:.4f}"
            print(line)
        else:
            print(f"- {name}: _missing_")


if __name__ == "__main__":
    main()
