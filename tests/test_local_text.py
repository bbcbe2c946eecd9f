"""Offline local-text corpus pipeline (data/local_text.py) — the
zero-egress stand-in for the reference's C4 streaming loader
(``simple_train.py:287-311``)."""

import numpy as np
import pytest

from sow_tpu.data.local_text import corpus_files, iter_documents, local_text_batches


class StubTok:
    """Whitespace 'tokenizer' with the HF-fast call surface the stream uses
    (str -> ids, list[str] -> list of ids)."""

    pad_token_id = 0

    def __call__(self, docs, return_tensors=None):
        if isinstance(docs, str):
            return {"input_ids": [hash(w) % 1000 + 2 for w in docs.split()]}
        return {"input_ids": [[hash(w) % 1000 + 2 for w in d.split()] for d in docs]}


@pytest.fixture
def corpus(tmp_path):
    for i in range(30):
        (tmp_path / f"doc{i:02d}.txt").write_text(
            (f"file{i} token{i} " * 40 + "\n") * 12  # > min_bytes
        )
    return str(tmp_path)


class TestCorpusFiles:
    def test_split_is_deterministic_and_disjoint(self, corpus):
        tr1 = corpus_files([corpus], split="train", val_percent=20)
        tr2 = corpus_files([corpus], split="train", val_percent=20)
        va = corpus_files([corpus], split="validation", val_percent=20)
        assert tr1 == tr2
        assert set(tr1).isdisjoint(va)
        assert len(tr1) + len(va) == 30
        assert va  # 20% of 30 files should hit at least once

    def test_min_bytes_filters(self, tmp_path):
        (tmp_path / "tiny.txt").write_text("x")
        (tmp_path / "big.txt").write_text("y" * 1000)
        files = corpus_files([str(tmp_path)], split="train", val_percent=0)
        assert [f.endswith("big.txt") for f in files] == [True]

    def test_missing_root_yields_nothing(self):
        assert corpus_files(["/nonexistent/path"]) == []


class TestBatches:
    def test_shapes_and_mask(self, corpus):
        it = local_text_batches(
            StubTok(), [corpus], batch_size=4, max_length=32,
            shuffle_buffer=8, seed=0, val_percent=0,
        )
        b = next(it)
        assert b["input_ids"].shape == (4, 32)
        assert b["attention_mask"].shape == (4, 32)
        assert b["input_ids"].dtype == np.int32
        # mask is a left-aligned run of ones
        for row_ids, row_mask in zip(b["input_ids"], b["attention_mask"]):
            n = int(row_mask.sum())
            assert (row_mask[:n] == 1).all() and (row_mask[n:] == 0).all()
            assert (row_ids[n:] == 0).all()  # pad id

    def test_chunking_uses_long_documents(self, tmp_path):
        # one long doc -> multiple max_length windows (the reference's
        # truncate semantics would discard everything past max_length)
        (tmp_path / "long.txt").write_text("word " * 4000)
        it = local_text_batches(
            StubTok(), [str(tmp_path)], batch_size=2, max_length=64,
            shuffle_buffer=2, seed=0, val_percent=0,
        )
        batches = [next(it) for _ in range(3)]
        assert all(b["input_ids"].shape == (2, 64) for b in batches)

    def test_validation_stream_terminates(self, corpus):
        it = local_text_batches(
            StubTok(), [corpus], split="validation", batch_size=2,
            max_length=32, shuffle_buffer=4, seed=0, val_percent=40,
        )
        batches = list(it)  # repeat=False for validation: must terminate
        assert batches

    def test_deterministic_given_seed(self, corpus):
        def first(seed):
            it = local_text_batches(
                StubTok(), [corpus], batch_size=2, max_length=16,
                shuffle_buffer=4, seed=seed, val_percent=0,
            )
            return next(it)["input_ids"]

        assert (first(5) == first(5)).all()

    def test_raises_on_empty_corpus(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            next(local_text_batches(StubTok(), [str(tmp_path)]))


class TestTokenCache:
    def test_cache_stream_identical_to_live(self, corpus, tmp_path):
        """The memmap token cache must reproduce the live-encoding stream
        exactly (same doc order, windows, reservoir draws) — it only
        removes the per-epoch BPE cost, not the distribution."""
        kw = dict(batch_size=4, max_length=32, shuffle_buffer=8, seed=3,
                  val_percent=0)
        cache = str(tmp_path / "tokcache")
        live = local_text_batches(StubTok(), [corpus], **kw)
        cached = local_text_batches(StubTok(), [corpus], cache_dir=cache, **kw)
        for _ in range(6):
            a, b = next(live), next(cached)
            assert (a["input_ids"] == b["input_ids"]).all()
            assert (a["attention_mask"] == b["attention_mask"]).all()

    def test_cache_built_once_and_invalidated(self, corpus, tmp_path):
        import os

        from sow_tpu.data.local_text import ensure_token_cache

        cache = str(tmp_path / "tokcache")
        ids1, off1 = ensure_token_cache(StubTok(), [corpus], "train", cache,
                                        val_percent=0)
        mtime = os.path.getmtime(ids1)
        ids2, _ = ensure_token_cache(StubTok(), [corpus], "train", cache,
                                     val_percent=0)
        assert ids2 == ids1 and os.path.getmtime(ids1) == mtime  # reused
        # corpus change -> listing hash changes -> rebuilt
        with open(os.path.join(corpus, "docnew.txt"), "w") as f:
            f.write("brand new doc " * 64)
        ensure_token_cache(StubTok(), [corpus], "train", cache, val_percent=0)
        import numpy as np

        offs = np.load(os.path.join(cache, "train_offsets.npy"))
        assert len(offs) == 32  # 31 docs + terminal

    def test_validation_cache_stream_terminates(self, corpus, tmp_path):
        it = local_text_batches(
            StubTok(), [corpus], split="validation", batch_size=2,
            max_length=32, shuffle_buffer=4, seed=0, val_percent=40,
            cache_dir=str(tmp_path / "tc"),
        )
        assert list(it)


class TestTrainedTokenizer:
    def test_bpe_artifact_roundtrip(self):
        """The committed flagship tokenizer (artifacts/bpe32k.json) loads
        and round-trips text within its 32k vocab."""
        from sow_tpu.data.local_text import load_local_tokenizer

        tok = load_local_tokenizer("artifacts/bpe32k.json")
        assert tok.vocab_size <= 32_000
        ids = tok("def main():\n    return 0")["input_ids"]
        assert ids and max(ids) < 32_000
        assert "main" in tok.decode(ids)
