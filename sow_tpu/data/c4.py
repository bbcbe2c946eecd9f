"""C4 streaming pipeline — HF datasets + tokenizer, process-sharded.

Rebuilds the reference input path (``simple_train.py:287-311`` +
``scripts/utils/dataloader.py``): streaming ``allenai/c4`` shuffled with a
buffer, split across training processes, tokenized to fixed ``max_length``
with padding+truncation (t5-base tokenizer), batched.

In the zero-egress environment this module can't download; callers should
fall back to ``sow_tpu.data.synthetic`` when ``load`` raises.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def c4_batches(
    tokenizer,
    split: str = "train",
    batch_size: int = 128,
    max_length: int = 256,
    seed: int = 42,
    process_index: int = 0,
    process_count: int = 1,
    shuffle_buffer: int = 10_000,
) -> Iterator[dict]:
    """Yield ``{"input_ids", "attention_mask"}`` numpy batches.

    Mirrors ``PreprocessedIterableDataset`` (``dataloader.py:6-47``): each
    process takes every ``process_count``-th example (the reference shards by
    rank via ``split_dataset_by_node``, ``simple_train.py:293-296``).
    """
    import datasets

    ds = datasets.load_dataset("allenai/c4", "en", split=split, streaming=True)
    if split == "train":
        ds = ds.shuffle(seed=seed, buffer_size=shuffle_buffer)
    if process_count > 1:
        # NOT datasets.distributed.<...> as an attribute — the real library
        # only exposes it as a submodule import (caught by the fixture tests).
        from datasets.distributed import split_dataset_by_node

        ds = split_dataset_by_node(ds, rank=process_index, world_size=process_count)

    ids_buf, mask_buf = [], []
    for example in ds:
        tok = tokenizer(
            example["text"],
            max_length=max_length,
            truncation=True,
            padding="max_length",
            return_tensors="np",
        )
        ids_buf.append(tok["input_ids"][0])
        mask_buf.append(tok["attention_mask"][0])
        if len(ids_buf) == batch_size:
            yield {
                "input_ids": np.stack(ids_buf).astype(np.int32),
                "attention_mask": np.stack(mask_buf).astype(np.int32),
            }
            ids_buf, mask_buf = [], []


def load_tokenizer(name: str = "t5-base"):
    """The reference tokenizes C4 with t5-base (``simple_train.py:298``)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name, model_max_length=int(1e9))


def make_pretrain_stream(
    batch_size: int,
    max_length: int,
    vocab_size: int,
    seed: int = 42,
    tokenizer_name: str = "t5-base",
    synthetic: bool = False,
    split: str = "train",
):
    """C4 if reachable, else the synthetic fallback (zero-egress test envs)."""
    if not synthetic:
        try:
            tok = load_tokenizer(tokenizer_name)
            return c4_batches(
                tok, split=split, batch_size=batch_size, max_length=max_length, seed=seed
            )
        except Exception as e:  # no network / cache: fall back loudly
            print(f"[data] C4 unavailable ({type(e).__name__}: {e}); using synthetic stream")
    from sow_tpu.data.synthetic import affine_stream

    return affine_stream(batch_size, max_length, vocab_size, seed=seed)
