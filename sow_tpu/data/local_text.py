"""Offline local-text pretraining corpus + tokenizer.

The reference pretrains on streaming ``allenai/c4`` with the t5-base
tokenizer (``simple_train.py:287-311``). This environment has zero network
egress, so neither is reachable; this module provides the same *pipeline
shape* from local files instead:

  * a deterministic train/validation document split (hash of the file path),
  * a BPE tokenizer trained offline with the ``tokenizers`` library at the
    reference's vocab size (32,000 — ``llama_60m.json``), so the model
    shapes match the flagship config exactly,
  * a shuffled, fixed-``max_length`` batch stream mirroring
    ``PreprocessedIterableDataset`` (``dataloader.py:6-47``), with optional
    chunking of long documents into consecutive windows (C4 web documents
    mostly fit in 256 tokens; local source/doc files are longer, and
    truncating them would discard most of the corpus).

Used by the flagship 25k-step experiment (readme.md:6-25) — see
``benchmarks/flagship_60m.sh`` and PARITY.md for the honest caveat that
this corpus is local text (code + docs), not C4.
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import Iterator, Optional, Sequence

import numpy as np

TEXT_EXTS = (".py", ".md", ".rst", ".txt")


def corpus_files(
    roots: Sequence[str],
    exts: Sequence[str] = TEXT_EXTS,
    split: str = "train",
    val_percent: int = 2,
    min_bytes: int = 256,
) -> list[str]:
    """Deterministic file list for a split. A file goes to validation when
    ``md5(path) % 100 < val_percent`` — stable across runs and machines."""
    out = []
    for root in roots:
        for dirpath, _, names in os.walk(root, followlinks=False):
            for name in names:
                if not name.endswith(tuple(exts)):
                    continue
                path = os.path.join(dirpath, name)
                try:
                    if os.path.getsize(path) < min_bytes:
                        continue
                except OSError:
                    continue
                h = int(hashlib.md5(path.encode()).hexdigest(), 16) % 100
                if (h < val_percent) == (split == "validation"):
                    out.append(path)
    out.sort()  # os.walk order is fs-dependent; the corpus must not be
    return out


def iter_documents(files: Sequence[str], seed: int = 0, repeat: bool = True) -> Iterator[str]:
    """Yield file contents, file order shuffled per epoch."""
    rng = random.Random(seed)
    files = list(files)
    while True:
        rng.shuffle(files)
        for path in files:
            try:
                with open(path, "r", encoding="utf-8", errors="ignore") as f:
                    yield f.read()
            except OSError:
                continue
        if not repeat:
            return


def train_bpe_tokenizer(
    files: Sequence[str],
    out_path: str,
    vocab_size: int = 32_000,
    sample_files: int = 4_000,
    seed: int = 0,
):
    """Train a byte-level BPE tokenizer offline (the t5-base stand-in) and
    save it as a ``tokenizers`` JSON loadable by ``load_local_tokenizer``."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    rng = random.Random(seed)
    sample = list(files)
    if len(sample) > sample_files:
        sample = rng.sample(sample, sample_files)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<pad>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )

    def text_iter():
        for path in sample:
            try:
                with open(path, "r", encoding="utf-8", errors="ignore") as f:
                    yield f.read()
            except OSError:
                continue

    tok.train_from_iterator(text_iter(), trainer=trainer)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tok.save(out_path)
    return out_path


def load_local_tokenizer(path: str):
    """Wrap a trained tokenizer JSON in the HF fast-tokenizer interface the
    data pipeline expects (pad/truncate/__call__/decode)."""
    from transformers import PreTrainedTokenizerFast

    return PreTrainedTokenizerFast(
        tokenizer_file=path,
        pad_token="<pad>",
        eos_token="</s>",
        model_max_length=int(1e9),
    )


def local_text_batches(
    tokenizer,
    roots: Sequence[str],
    split: str = "train",
    batch_size: int = 128,
    max_length: int = 256,
    seed: int = 42,
    chunk: bool = True,
    # sized for multi-MB local files: one 5 MB source file emits ~5k
    # CONSECUTIVE windows, so a small reservoir yields batches dominated
    # by single documents (measured as +-3 nat train-loss swings at
    # llama-60m bs-256); 32k windows (~32 MB) mixes across ~dozens of
    # large documents
    shuffle_buffer: int = 32_768,
    repeat: Optional[bool] = None,
    val_percent: int = 2,
) -> Iterator[dict]:
    """Yield ``{"input_ids", "attention_mask"}`` numpy batches from local
    files — the offline counterpart of ``c4.c4_batches``.

    ``chunk=True`` splits each document into consecutive ``max_length``
    windows (all data used); ``chunk=False`` reproduces the reference's
    truncate-at-max_length semantics (``dataloader.py:25-35``). Windows go
    through a size-``shuffle_buffer`` reservoir like the reference's
    streaming ``.shuffle`` (``simple_train.py:289``).
    """
    files = corpus_files(roots, split=split, val_percent=val_percent)
    if not files:
        raise FileNotFoundError(f"no corpus files under {roots}")
    if repeat is None:
        repeat = split == "train"
    rng = random.Random(seed + 1)
    pad_id = getattr(tokenizer, "pad_token_id", 0) or 0

    def windows() -> Iterator[np.ndarray]:
        # encode documents in groups: the fast-tokenizer backend parallelizes
        # across a batch (rayon), and single-doc encodes were the measured
        # training bottleneck (~35% step-time stall at llama-60m bs-256)
        def encoded():
            group: list[str] = []
            for doc in iter_documents(files, seed=seed, repeat=repeat):
                group.append(doc)
                if len(group) == 16:
                    yield from tokenizer(group, return_tensors=None)["input_ids"]
                    group.clear()
            if group:
                yield from tokenizer(group, return_tensors=None)["input_ids"]

        for ids in encoded():
            if not ids:
                continue
            if chunk:
                for s in range(0, len(ids), max_length):
                    w = ids[s : s + max_length]
                    if len(w) >= 16:  # drop tiny tails
                        yield np.asarray(w, np.int32)
            else:
                yield np.asarray(ids[:max_length], np.int32)

    buf: list[np.ndarray] = []
    ids_buf, mask_buf = [], []

    def emit(w: np.ndarray):
        ids = np.full((max_length,), pad_id, np.int32)
        mask = np.zeros((max_length,), np.int32)
        ids[: len(w)] = w
        mask[: len(w)] = 1
        ids_buf.append(ids)
        mask_buf.append(mask)

    for w in windows():
        if len(buf) < shuffle_buffer:
            buf.append(w)
            continue
        j = rng.randrange(shuffle_buffer)
        buf[j], w = w, buf[j]
        emit(w)
        if len(ids_buf) == batch_size:
            yield {
                "input_ids": np.stack(ids_buf),
                "attention_mask": np.stack(mask_buf),
            }
            ids_buf.clear(), mask_buf.clear()
    rng.shuffle(buf)
    for w in buf:  # drain (validation / non-repeating streams)
        emit(w)
        if len(ids_buf) == batch_size:
            yield {
                "input_ids": np.stack(ids_buf),
                "attention_mask": np.stack(mask_buf),
            }
            ids_buf.clear(), mask_buf.clear()
