"""Background prefetcher tests (data/prefetch.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.data.prefetch import Prefetcher


class TestPrefetcher:
    def test_order_and_completeness(self):
        src = ({"input_ids": np.full((2, 4), i)} for i in range(20))
        out = [int(b["input_ids"][0, 0]) for b in Prefetcher(src, depth=3)]
        assert out == list(range(20))

    def test_device_put_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(2, 1, 1, devices=jax.devices()[:2])
        sh = NamedSharding(mesh, P("data"))
        src = ({"input_ids": np.arange(8).reshape(2, 4)} for _ in range(3))
        batches = list(Prefetcher(src, depth=2, shardings=sh))
        assert len(batches) == 3
        arr = batches[0]["input_ids"]
        assert isinstance(arr, jax.Array)
        assert arr.sharding == sh
        np.testing.assert_array_equal(np.asarray(arr), np.arange(8).reshape(2, 4))

    def test_exception_propagates(self):
        def bad():
            yield {"input_ids": np.zeros((1, 1))}
            raise ValueError("boom")

        it = Prefetcher(bad(), depth=2)
        next(it)
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_close_stops_worker(self):
        def slow():
            i = 0
            while True:
                yield {"input_ids": np.full((1, 1), i)}
                i += 1

        p = Prefetcher(slow(), depth=2)
        next(p)
        p.close()
        time.sleep(0.3)
        assert not p._thread.is_alive()

    def test_overlaps_slow_source(self):
        """With depth-2 prefetch, consuming N batches takes ~max(host, use)
        time, not the sum (the point of the thing)."""

        def slow_src():
            for i in range(6):
                time.sleep(0.05)
                yield {"input_ids": np.full((1, 1), i)}

        t0 = time.perf_counter()
        for _ in Prefetcher(slow_src(), depth=3):
            time.sleep(0.05)  # simulated device step
        overlapped = time.perf_counter() - t0
        # serial would be ~0.6s; overlapped ~0.35s. Allow slack for CI noise.
        assert overlapped < 0.55, overlapped


def test_verify_transfers_clean_and_corrupt():
    """Transfer-integrity telemetry: clean uploads raise nothing; a forced
    device/host byte divergence is detected and counted (lazily, with no
    pipeline sync)."""
    import warnings

    import jax
    import numpy as np

    from sow_tpu.data.prefetch import Prefetcher

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def src(n):
        rng = np.random.default_rng(0)
        for _ in range(n):
            yield {"input_ids": rng.integers(0, 100, (4, 8), dtype=np.int32)}

    p = Prefetcher(src(15), depth=2, shardings=sharding, verify_transfers=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any corruption warning -> failure
        batches = list(p)
    assert len(batches) == 15
    assert p.transfer_errors == 0

    # force a divergence through the audit hook directly
    p2 = Prefetcher(src(1), depth=1, shardings=sharding, verify_transfers=True)
    list(p2)
    host = np.arange(32, dtype=np.int32)
    dev = jax.device_put(host + 1, sharding)  # different bytes
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(10):  # push past the lazy-settle window
            p2._audit("input_ids", host, dev)
    assert p2.transfer_errors > 0
