"""Synthetic LM data — deterministic, learnable streams for tests/benchmarks.

Stands in for streaming C4 (``simple_train.py:287-296``) in the zero-egress
test environment; the real C4 pipeline lives in ``sow_tpu.data.c4``.
"""

from __future__ import annotations

import numpy as np


def affine_stream(
    batch_size: int,
    seq_len: int,
    vocab_size: int,
    seed: int = 0,
    mult: int = 7,
    add: int = 3,
):
    """Infinite iterator of batches whose next token is an affine function of
    the current one — a pattern a tiny LM learns in a few hundred steps, so
    "loss decreases" tests have signal."""
    rng = np.random.default_rng(seed)
    while True:
        start = rng.integers(0, vocab_size, size=(batch_size, 1))
        seqs = [start]
        for _ in range(seq_len - 1):
            seqs.append((seqs[-1] * mult + add) % vocab_size)
        ids = np.concatenate(seqs, axis=1).astype(np.int32)
        yield {"input_ids": ids, "attention_mask": np.ones_like(ids)}


def random_stream(batch_size: int, seq_len: int, vocab_size: int, seed: int = 0):
    """Uniform random tokens (for throughput benchmarks — data content is
    irrelevant to step time)."""
    rng = np.random.default_rng(seed)
    while True:
        ids = rng.integers(0, vocab_size, size=(batch_size, seq_len)).astype(np.int32)
        yield {"input_ids": ids, "attention_mask": np.ones_like(ids)}
