"""Summarize the llama-9m convergence-deficit ablations (convergence_9m.sh).

Reads artifacts/conv9m/*.jsonl and prints a markdown table of final train
losses (mean of the last 3 logged steps, to damp batch noise) for the
headline seeded dense/SoW pairs and each single-knob ablation, plus the
seeded gap with a rough sigma from the replica spread.

The round-2 finding to diagnose (PARITY.md "Convergence parity"): SoW
0.2278 vs dense 0.1940 at 800 steps (r=32, acc=200), hypothesized as
"late-stage capacity between accumulations". Ablation knobs:
  keep   — carry SoW Adam moments across accumulation events
  scale  — scale -> 1/rank after the first accumulation (run_glue.py:993-1002)
  acc100/acc400 — accumulation cadence
  r64    — rank

Usage: python benchmarks/conv9m_report.py [dir]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys


def tail_losses(path: str, k: int = 3) -> list[float]:
    vals = []
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec and "eval_loss" not in rec:
                    vals.append(rec["loss"])
    except FileNotFoundError:
        return []
    return vals[-k:]


def run_telemetry(path: str) -> dict:
    """Median steady-state tokens/s + device-memory probe (update 10)."""
    tps, mem = [], None
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if "tokens_per_sec" in rec and rec.get("step", 0) > 100:
                    tps.append(rec["tokens_per_sec"])
                if "memory" in rec:
                    mem = rec["memory"]
    except FileNotFoundError:
        pass
    out = {}
    if tps:
        out["tokens_per_sec"] = statistics.median(tps)
    if isinstance(mem, dict):
        for k in ("bytes_in_use", "peak_bytes_in_use"):
            if k in mem:
                out[k] = mem[k]
    # the tunneled runtime reports no device memory_stats; the trainer's
    # startup report (host-computed from the state tree) is authoritative
    # for optimizer-state bytes
    try:
        with open(path[:-6] + ".log") as f:
            for line in f:
                if line.startswith("optimizer state:"):
                    out["opt_state_mib"] = float(line.split(":")[1].split("MiB")[0])
    except (FileNotFoundError, ValueError):
        pass
    return out


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/conv9m"
    runs = {}
    for path in sorted(glob.glob(os.path.join(out, "*.jsonl"))):
        name = os.path.basename(path)[:-6]
        tl = tail_losses(path)
        if tl:
            runs[name] = sum(tl) / len(tl)
    if not runs:
        print(f"no metrics under {out}")
        return

    def seeded(prefix):
        vals = [v for k, v in runs.items()
                if k == prefix or k.startswith(prefix + "_s")]
        return vals

    dense, sow = seeded("dense"), seeded("sow")
    telem = {
        name: run_telemetry(os.path.join(out, name + ".jsonl"))
        for name in runs
    }
    print("| run | final loss (last-3 mean) | median tok/s | opt state MiB |")
    print("|---|---|---|---|")
    for name in sorted(runs):
        t = telem.get(name, {})
        tps = f"{t['tokens_per_sec']:,.0f}" if "tokens_per_sec" in t else "-"
        opt = f"{t['opt_state_mib']:,.1f}" if "opt_state_mib" in t else "-"
        print(f"| {name} | {runs[name]:.4f} | {tps} | {opt} |")
    if dense and sow:
        md, ms = statistics.mean(dense), statistics.mean(sow)
        sd = statistics.pstdev(dense + sow) or 1e-9
        print()
        print(f"seeded dense {md:.4f} (n={len(dense)}) vs sow {ms:.4f} "
              f"(n={len(sow)}); gap {ms - md:+.4f} (~{(ms - md) / sd:.1f} "
              f"pooled-sigma)")
        base = runs.get("sow")
        if base is not None:
            print()
            print("ablation deltas vs the headline sow run (negative = closes the gap):")
            for name in ("keep", "scale", "acc100", "acc400", "r64",
                         "resetsched9m", "warm_r64", "warm_combo"):
                if name in runs:
                    print(f"  {name:12s} {runs[name] - base:+.4f} -> {runs[name]:.4f}")

        # round-4 seeded arms: grad warm-start reinit and TT-Adam, reported
        # against their seeded baselines with the same pooled-sigma framing
        for label, pfx, ref_vals, ref_name in (
            ("warm-start (sow_reinit=grad)", "warm", sow, "sow"),
            ("TT-Adam on sow", "ttadam_sow", sow, "sow"),
            ("TT-Adam on dense", "ttadam_dense", dense, "dense"),
        ):
            vals = seeded(pfx)
            if vals and ref_vals:
                mv, mr = statistics.mean(vals), statistics.mean(ref_vals)
                sd2 = statistics.pstdev(vals + ref_vals) or 1e-9
                print()
                print(f"{label}: {mv:.4f} (n={len(vals)}) vs {ref_name} "
                      f"{mr:.4f} (n={len(ref_vals)}); delta {mv - mr:+.4f} "
                      f"(~{(mv - mr) / sd2:.1f} pooled-sigma)")


if __name__ == "__main__":
    main()
