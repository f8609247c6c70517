"""Native C++ host runtime vs the pure-Python implementations: bit-exact
conversions, SPSC ring semantics, and a real two-thread stress test."""

import threading

import numpy as np
import pytest

from totton_tpu import native
from totton_tpu.io.pcm import PcmFormat

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _python_pcm_to_float(data, fmt):
    buf = np.frombuffer(data, dtype=np.uint8)
    if fmt is PcmFormat.S16_LE:
        ints = buf.view("<i2").astype(np.float32)
    elif fmt is PcmFormat.S32_LE:
        ints = buf.view("<i4").astype(np.float32)
    else:
        tri = buf.reshape(-1, 3).astype(np.int32)
        vals = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
        vals = np.where(vals & 0x00800000, vals - (1 << 24), vals)
        ints = vals.astype(np.float32)
    return ints * np.float32(1.0 / fmt.scale)


def _python_float_to_pcm(x, fmt):
    clamped = np.clip(x, np.float32(-1.0), np.float32(fmt.clamp_hi))
    scaled = clamped * np.float32(fmt.scale)
    if fmt is PcmFormat.S16_LE:
        return scaled.astype("<i2").tobytes()
    if fmt is PcmFormat.S32_LE:
        vals = np.clip(scaled.astype(np.int64), -(1 << 31), (1 << 31) - 1)
        return vals.astype("<i4").tobytes()
    vals = np.clip(scaled.astype(np.int64), -(1 << 23), (1 << 23) - 1).astype(
        np.int32
    )
    out = np.empty((len(vals), 3), dtype=np.uint8)
    out[:, 0] = vals & 0xFF
    out[:, 1] = (vals >> 8) & 0xFF
    out[:, 2] = (vals >> 16) & 0xFF
    return out.tobytes()


@pytest.mark.parametrize("fmt", list(PcmFormat))
class TestConversionParity:
    def test_to_float_bit_exact(self, fmt, rng):
        raw = rng.integers(0, 256, size=3 * 4 * 1000, dtype=np.uint8).tobytes()
        n = len(raw) - len(raw) % fmt.bytes
        raw = raw[:n]
        np.testing.assert_array_equal(
            native.pcm_to_float(raw, fmt), _python_pcm_to_float(raw, fmt)
        )

    def test_from_float_bit_exact(self, fmt, rng):
        # Include clipping edges and exact boundaries.
        x = np.concatenate([
            rng.uniform(-1.2, 1.2, size=4096),
            [1.0, -1.0, 1.5, -1.5, 0.0, fmt.clamp_hi],
        ]).astype(np.float32)
        assert native.float_to_pcm(x, fmt) == _python_float_to_pcm(x, fmt)


class TestInterleaveParity:
    def test_round_trip(self, rng):
        x = rng.normal(size=(4, 777)).astype(np.float32)
        inter = native.interleave(x)
        np.testing.assert_array_equal(inter, x.T.reshape(-1))
        back = native.deinterleave(inter, 4)
        np.testing.assert_array_equal(back, x)


class TestNativeRing:
    def test_basic_semantics(self):
        rb = native.NativeRingBuffer(16)
        assert rb.capacity == 16
        assert rb.write(np.arange(10, dtype=np.float32))
        assert rb.available_to_read() == 10
        assert not rb.write(np.zeros(7, np.float32))  # overflow all-or-nothing
        got = rb.read(4)
        np.testing.assert_array_equal(got, [0, 1, 2, 3])
        assert rb.read(100) is None  # underflow
        rb.clear()
        assert rb.available_to_read() == 0

    def test_wraparound(self):
        rb = native.NativeRingBuffer(7)
        src = np.arange(200, dtype=np.float32)
        pos, out = 0, []
        for _ in range(100):
            if rb.write(src[pos : pos + 3]):
                pos += 3
            got = rb.read(2)
            if got is not None:
                out.extend(got)
        tail = rb.read(rb.available_to_read())
        out.extend(tail)
        np.testing.assert_array_equal(np.array(out), src[:pos])

    def test_two_thread_stress(self):
        """Real SPSC usage: producer and consumer on separate threads must
        transfer every sample in order."""
        rb = native.NativeRingBuffer(1024)
        total = 200_000
        src = np.arange(total, dtype=np.float32)
        received = np.empty(total, dtype=np.float32)

        def producer():
            pos = 0
            while pos < total:
                n = min(97, total - pos)
                if rb.write(src[pos : pos + n]):
                    pos += n

        def consumer():
            pos = 0
            while pos < total:
                n = min(61, total - pos)
                got = rb.read(n)
                if got is not None:
                    received[pos : pos + n] = got
                    pos += n

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(timeout=60); tc.join(timeout=60)
        assert not tp.is_alive() and not tc.is_alive()
        np.testing.assert_array_equal(received, src)

    def test_uninitialized(self):
        rb = native.NativeRingBuffer.__new__(native.NativeRingBuffer)
        rb._lib = native._load()
        rb._handle = None
        assert not rb.write(np.ones(1, np.float32))
        assert rb.read(1) is None
