"""Generate a fixture-FORMAT commonsense eval set from the offline corpus.

The reference's eval sets (LLM-Adapters ``test.json``: records with
``instruction`` + ``answer``) are egress-blocked here, so this builds an
ARC-style multiple-choice set whose *instructions* are real corpus text and
whose answer keys are uniform-random over answer1..answer5 — the W4 harness
(generate -> response split -> regex extract -> running accuracy,
ref commonsense_evaluate.py:108-140,338-369) is what's being exercised;
the expected score for any model is ~chance, and what must hold is
engine-identical accuracy between the fixed-batch and server paths.

Usage: python benchmarks/make_eval_set.py [out.json] [n_records]
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOTS = ["/opt/venv/lib/python3.12/site-packages", "/usr/lib/python3.11"]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/r4/arc_style_eval.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from sow_tpu.data.local_text import corpus_files

    files = corpus_files(ROOTS, split="validation")
    rng = random.Random(0)
    records = []
    while len(records) < n:
        path = rng.choice(files)
        try:
            text = open(path, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        if len(text) < 400:
            continue
        start = rng.randrange(len(text) - 300)
        snippet = " ".join(text[start:start + 300].split())[:240]
        if not snippet:
            continue
        records.append({
            "instruction": (
                "Please choose the correct answer to the question: "
                f"What does the following text concern? {snippet} "
                "Answer1: configuration Answer2: documentation "
                "Answer3: source code Answer4: testing Answer5: packaging\n\n"
                "Answer format: answer1/answer2/answer3/answer4/answer5"
            ),
            "input": "",
            "output": "",
            "answer": f"answer{rng.randint(1, 5)}",
        })
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"wrote {len(records)} ARC-style records -> {out}")


if __name__ == "__main__":
    main()
