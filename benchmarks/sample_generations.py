"""Qualitative check: sample completions from a flagship-trained checkpoint.

Greedy-decodes held-out (validation-split) prompts through the trained
model so the writeup can show the 25k-step run produced a real language
model of its corpus, not just a loss curve.

Usage:
  python benchmarks/sample_generations.py artifacts/flagship/sow_ckpt sow [n]
Prints prompt → completion pairs as JSON lines.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

ROOTS = ["/opt/venv/lib/python3.12/site-packages", "/usr/lib/python3.11"]
TOK = "artifacts/bpe32k.json"


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "artifacts/flagship/sow_ckpt"
    arch = sys.argv[2] if len(sys.argv) > 2 else "sow"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from benchmarks.spec_bench import load_params
    from sow_tpu.data.local_text import corpus_files, load_local_tokenizer
    from sow_tpu.eval.generate import greedy_generate, left_pad

    tok = load_local_tokenizer(TOK)
    params, cfg = load_params("llama_60m", arch, ckpt)

    # prompts cut from HELD-OUT validation files (path-hash split)
    prompts, texts = [], []
    for path in corpus_files(ROOTS, split="validation"):
        try:
            text = open(path, errors="ignore").read()
        except OSError:
            continue
        ids = tok(text)["input_ids"]
        if len(ids) >= 96:
            prompts.append(ids[:64])
            texts.append(path)
        if len(prompts) >= n:
            break

    ids, mask = left_pad(prompts, 0)
    out = np.asarray(
        greedy_generate(params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                        max_new_tokens=64)
    )
    for i in range(len(prompts)):
        print(json.dumps({
            "source": texts[i],
            "prompt": tok.decode(prompts[i]),
            "completion": tok.decode([int(t) for t in out[i]]),
        }))


if __name__ == "__main__":
    main()
