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


def ensure_token_cache(
    tokenizer,
    roots: Sequence[str],
    split: str,
    cache_dir: str,
    val_percent: int = 2,
    group: int = 64,
) -> tuple[str, str]:
    """Tokenize the whole split ONCE into a memmappable cache.

    The chip host has a single CPU; live BPE encoding caps the flagship
    training stream at ~90-100k tokens/s overall (the chip idles ~2/3 of
    each step waiting on the tokenizer — measured on the 25k-step run,
    PARITY.md "Flagship run"). Tokenizing the ~550 MB corpus once
    (~minutes) and streaming windows from a uint16 memmap makes training
    chip-bound. The reference has no equivalent because its C4 pipeline
    runs 8 tokenizer worker processes per rank (``simple_train.py:311``);
    on a 1-CPU host the cache is the TPU-first answer.

    Layout: ``{split}_ids.npy`` — all document ids concatenated (uint16
    when the vocab fits, else int32); ``{split}_offsets.npy`` — int64
    prefix offsets, one per document + terminal. Document order matches
    ``corpus_files`` order, so epoch shuffling reproduces the live path's
    distribution. A meta sidecar invalidates the cache when the file list
    changes.
    """
    import json as _json

    files = corpus_files(roots, split=split, val_percent=val_percent)
    if not files:
        raise FileNotFoundError(f"no corpus files under {roots}")
    os.makedirs(cache_dir, exist_ok=True)
    ids_path = os.path.join(cache_dir, f"{split}_ids.npy")
    off_path = os.path.join(cache_dir, f"{split}_offsets.npy")
    meta_path = os.path.join(cache_dir, f"{split}_meta.json")
    listing = hashlib.md5("\n".join(files).encode()).hexdigest()
    vocab = int(getattr(tokenizer, "vocab_size", 0) or 0)
    dtype = "uint16" if 0 < vocab <= 65_536 else "int32"
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                meta = _json.load(f)
            if (
                meta.get("listing") == listing
                and meta.get("dtype") == dtype
                and os.path.exists(ids_path)
                and os.path.exists(off_path)
            ):
                return ids_path, off_path
        except (OSError, ValueError):
            pass

    chunks: list[np.ndarray] = []
    offsets = [0]
    total = 0
    for start in range(0, len(files), group):
        texts = []
        for path in files[start : start + group]:
            try:
                with open(path, "r", encoding="utf-8", errors="ignore") as f:
                    texts.append(f.read())
            except OSError:
                texts.append("")
        for ids in tokenizer(texts, return_tensors=None)["input_ids"]:
            arr = np.asarray(ids, dtype)
            chunks.append(arr)
            total += len(arr)
            offsets.append(total)
    np.save(ids_path, np.concatenate(chunks) if chunks else np.zeros(0, dtype))
    np.save(off_path, np.asarray(offsets, np.int64))
    with open(meta_path, "w") as f:
        _json.dump({"listing": listing, "dtype": dtype, "files": len(files),
                    "tokens": total}, f)
    return ids_path, off_path


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
    cache_dir: Optional[str] = None,
) -> Iterator[dict]:
    """Yield ``{"input_ids", "attention_mask"}`` numpy batches from local
    files — the offline counterpart of ``c4.c4_batches``.

    ``chunk=True`` splits each document into consecutive ``max_length``
    windows (all data used); ``chunk=False`` reproduces the reference's
    truncate-at-max_length semantics (``dataloader.py:25-35``). Windows go
    through a size-``shuffle_buffer`` reservoir like the reference's
    streaming ``.shuffle`` (``simple_train.py:289``).

    ``cache_dir`` switches the document source from live BPE encoding to a
    pre-tokenized memmap (built on first use — ``ensure_token_cache``);
    document order, epoch shuffling, windowing and the reservoir are
    identical, so the stream has the same distribution, just unthrottled
    by the host CPU.
    """
    files = corpus_files(roots, split=split, val_percent=val_percent)
    if not files:
        raise FileNotFoundError(f"no corpus files under {roots}")
    if repeat is None:
        repeat = split == "train"
    rng = random.Random(seed + 1)
    pad_id = getattr(tokenizer, "pad_token_id", 0) or 0

    def doc_ids() -> Iterator[np.ndarray]:
        if cache_dir is not None:
            ids_path, off_path = ensure_token_cache(
                tokenizer, roots, split, cache_dir, val_percent=val_percent
            )
            all_ids = np.load(ids_path, mmap_mode="r")
            offsets = np.load(off_path)
            order = list(range(len(offsets) - 1))
            # random.Random(seed).shuffle over indices reproduces
            # iter_documents' per-epoch path-list permutation exactly
            order_rng = random.Random(seed)
            while True:
                order_rng.shuffle(order)
                for i in order:
                    yield np.asarray(all_ids[offsets[i] : offsets[i + 1]])
                if not repeat:
                    return
        else:
            # encode documents in groups: the fast-tokenizer backend
            # parallelizes across a batch (rayon), and single-doc encodes
            # were the measured training bottleneck (~35% step-time stall
            # at llama-60m bs-256)
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
                yield np.asarray(ids, np.int32)

    def windows() -> Iterator[np.ndarray]:
        for ids in doc_ids():
            if len(ids) == 0:
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
