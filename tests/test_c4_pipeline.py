"""C4 pipeline logic tests with a stubbed ``datasets`` module (zero-egress:
validates tokenize/batch/shard behavior without the hub)."""

import sys
import types

import numpy as np
import pytest


class _FakeStream:
    def __init__(self, texts):
        self._texts = texts

    def shuffle(self, seed=None, buffer_size=None):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self._texts))
        return _FakeStream([self._texts[i] for i in order])

    def __iter__(self):
        for t in self._texts:
            yield {"text": t}


def _install_fake_datasets(texts):
    fake = types.ModuleType("datasets")
    fake.load_dataset = lambda *a, **k: _FakeStream(texts)

    dist = types.ModuleType("datasets.distributed")

    def split_dataset_by_node(ds, rank, world_size):
        return _FakeStream(ds._texts[rank::world_size])

    dist.split_dataset_by_node = split_dataset_by_node
    fake.distributed = dist
    sys.modules["datasets"] = fake
    sys.modules["datasets.distributed"] = dist
    return fake


class _FakeTokenizer:
    def __call__(self, text, max_length=None, truncation=False, padding=None, return_tensors=None):
        ids = [2 + (hash(w) % 100003) for w in text.split()][:max_length]
        mask = [1] * len(ids)
        if padding == "max_length":
            pad = max_length - len(ids)
            ids = ids + [0] * pad
            mask = mask + [0] * pad
        return {"input_ids": np.asarray([ids]), "attention_mask": np.asarray([mask])}


@pytest.fixture()
def fake_datasets():
    texts = [f"document number {i} with some words " + "x " * (i % 7) for i in range(40)]
    old = sys.modules.get("datasets"), sys.modules.get("datasets.distributed")
    _install_fake_datasets(texts)
    yield texts
    for name, mod in zip(("datasets", "datasets.distributed"), old):
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


class TestC4Batches:
    def test_batch_shapes_and_padding(self, fake_datasets):
        from sow_tpu.data.c4 import c4_batches

        batches = list(c4_batches(_FakeTokenizer(), split="validation", batch_size=8, max_length=16))
        assert len(batches) == 5  # 40 docs / 8
        for b in batches:
            assert b["input_ids"].shape == (8, 16)
            assert b["attention_mask"].shape == (8, 16)
            assert ((b["input_ids"] == 0) == (b["attention_mask"] == 0)).all()

    def test_process_sharding_partitions_stream(self, fake_datasets):
        from sow_tpu.data.c4 import c4_batches

        b0 = list(c4_batches(_FakeTokenizer(), split="validation", batch_size=4, max_length=8,
                             process_index=0, process_count=2))
        b1 = list(c4_batches(_FakeTokenizer(), split="validation", batch_size=4, max_length=8,
                             process_index=1, process_count=2))
        # each process sees half the documents, disjoint
        rows0 = {tuple(r) for b in b0 for r in np.asarray(b["input_ids"])}
        rows1 = {tuple(r) for b in b1 for r in np.asarray(b["input_ids"])}
        assert len(rows0 & rows1) == 0
        assert len(b0) == len(b1) == 5  # 20 docs / 4

    def test_train_split_shuffles(self, fake_datasets):
        from sow_tpu.data.c4 import c4_batches

        a = next(c4_batches(_FakeTokenizer(), split="train", seed=1, batch_size=8, max_length=8))
        b = next(c4_batches(_FakeTokenizer(), split="train", seed=2, batch_size=8, max_length=8))
        assert not np.array_equal(a["input_ids"], b["input_ids"])
