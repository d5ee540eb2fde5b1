"""Native C++ ingest ring: build, LUT conversion, SPSC flow, drop policy."""

import threading
import time

import numpy as np
import pytest

from sdrreceiver_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestLut:
    def test_matches_reference_lut(self, rng):
        raw = rng.integers(0, 256, 4096).astype(np.uint8)
        out = native.u8_to_f32(raw)
        np.testing.assert_array_equal(out, raw.astype(np.float32) - 127.0)


class TestRing:
    def test_push_pop_roundtrip(self, rng):
        ring = native.IngestRing(block_bytes=1024, n_slots=4)
        blocks = [rng.integers(0, 256, 1024).astype(np.uint8) for _ in range(3)]
        for b in blocks:
            assert ring.push(b) == 0
        for b in blocks:
            got = ring.pop_f32(timeout_ms=1000)
            np.testing.assert_array_equal(got, b.astype(np.float32) - 127.0)
        assert ring.stats["pushed"] == 3 and ring.stats["popped"] == 3
        ring.close()

    def test_drop_on_full(self, rng):
        ring = native.IngestRing(block_bytes=64, n_slots=2)
        b = rng.integers(0, 256, 64).astype(np.uint8)
        assert ring.push(b) == 0
        assert ring.push(b) == 0
        assert ring.push(b) == 1  # dropped, like jonti/sdr.cpp:104-111
        assert ring.stats["dropped"] == 1
        ring.close()

    def test_pop_timeout(self):
        ring = native.IngestRing(block_bytes=64, n_slots=2)
        t0 = time.time()
        assert ring.pop_f32(timeout_ms=100) is None
        assert 0.05 < time.time() - t0 < 2.0
        ring.close()

    def test_producer_consumer_threads(self, rng):
        ring = native.IngestRing(block_bytes=2048, n_slots=8)
        n_blocks = 50
        blocks = [rng.integers(0, 256, 2048).astype(np.uint8) for _ in range(n_blocks)]
        got = []

        def producer():
            for b in blocks:
                while ring.push(b) == 1:
                    time.sleep(0.0005)
            ring.close()

        t = threading.Thread(target=producer)
        t.start()
        while True:
            out = ring.pop_f32(timeout_ms=2000)
            if out is None:
                break
            got.append(out)
        t.join()
        assert len(got) == n_blocks
        for g, b in zip(got, blocks):
            np.testing.assert_array_equal(g, b.astype(np.float32) - 127.0)
        # "dropped" counts rejected push attempts; the producer retried them,
        # so no data was lost even if backpressure fired
        assert ring.stats["popped"] == n_blocks

    def test_blocking_push(self, rng):
        ring = native.IngestRing(block_bytes=32, n_slots=1)
        b = rng.integers(0, 256, 32).astype(np.uint8)
        assert ring.push(b) == 0
        done = []

        def pusher():
            done.append(ring.push(b, block_on_full=True))

        t = threading.Thread(target=pusher)
        t.start()
        time.sleep(0.1)
        assert not done  # blocked
        assert ring.pop_f32(timeout_ms=1000) is not None
        t.join(timeout=2)
        assert done == [0]
        ring.close()
