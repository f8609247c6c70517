"""IO layer tests: PCM conversion round-trips, WAV IO, ring buffer,
negotiation — strategy modeled on the reference's test_alsa_common.cpp,
test_audio_ring_buffer.cpp, test_auto_negotiation.cpp."""

import numpy as np
import pytest

from totton_tpu.io.devices import (
    LoopbackPair,
    NullSink,
    NullSource,
    SinkCapability,
    list_devices,
    open_sink,
    open_source,
)
from totton_tpu.io.formats import PcmFormatSet
from totton_tpu.io.negotiation import (
    AutoNegotiator,
    NegotiationError,
    best_rate_for_family,
    calculate_upsample_ratio,
    rate_family,
)
from totton_tpu.io.pcm import (
    PcmFormat,
    TpdfDitherer,
    deinterleave,
    float_to_pcm,
    interleave,
    parse_format,
    pcm_to_float,
)
from totton_tpu.io.ring_buffer import AudioRingBuffer
from totton_tpu.io.wav import read_wav, write_wav


class TestPcmFormats:
    def test_parse_aliases(self):
        assert parse_format("s16") is PcmFormat.S16_LE
        assert parse_format("S24_3LE") is PcmFormat.S24_3LE
        assert parse_format("s32_le") is PcmFormat.S32_LE
        with pytest.raises(ValueError):
            parse_format("f32")

    def test_bytes(self):
        assert [f.bytes for f in PcmFormat] == [2, 3, 4]

    @pytest.mark.parametrize("fmt", list(PcmFormat))
    def test_round_trip(self, fmt, rng):
        x = rng.uniform(-0.9, 0.9, size=256).astype(np.float32)
        back = pcm_to_float(float_to_pcm(x, fmt), fmt)
        tol = {"S16_LE": 2 / 32768, "S24_3LE": 2 / 8388608,
               "S32_LE": 2 / 2147483648}[fmt.value]
        np.testing.assert_allclose(back, x, atol=tol)

    def test_clipping(self):
        x = np.array([1.5, -1.5, 1.0, -1.0], dtype=np.float32)
        out = pcm_to_float(float_to_pcm(x, PcmFormat.S16_LE), PcmFormat.S16_LE)
        assert out[0] == out[2]  # both clamped to the same positive max
        assert out[1] == out[3] == -1.0
        assert out[0] < 1.0

    def test_s24_sign_extension(self):
        # -1.0 -> 0x800000 pattern; round trip must stay negative.
        raw = bytes([0x00, 0x00, 0x80])
        val = pcm_to_float(raw, PcmFormat.S24_3LE)
        assert val[0] == pytest.approx(-1.0)

    def test_interleave_round_trip(self, rng):
        x = rng.normal(size=(3, 64)).astype(np.float32)
        np.testing.assert_array_equal(deinterleave(interleave(x), 3), x)


class TestWav:
    @pytest.mark.parametrize("fmt", list(PcmFormat))
    def test_round_trip(self, tmp_path, rng, fmt):
        x = rng.uniform(-0.8, 0.8, size=(2, 1000)).astype(np.float32)
        p = str(tmp_path / "t.wav")
        write_wav(p, x, 44100, fmt)
        y, rate = read_wav(p)
        assert rate == 44100
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=3 / (fmt.scale / 2))


class TestRingBuffer:
    def test_uninitialized_fails(self):
        rb = AudioRingBuffer()
        assert not rb.write(np.ones(4, np.float32))
        assert rb.read(1) is None

    def test_capacity_and_counts(self):
        rb = AudioRingBuffer(16)
        assert rb.available_to_write() == 16
        assert rb.write(np.arange(10, dtype=np.float32))
        assert rb.available_to_read() == 10
        assert rb.available_to_write() == 6

    def test_overflow_rejected_whole(self):
        rb = AudioRingBuffer(8)
        assert rb.write(np.ones(6, np.float32))
        assert not rb.write(np.ones(3, np.float32))  # all-or-nothing
        assert rb.available_to_read() == 6

    def test_underflow_returns_none(self):
        rb = AudioRingBuffer(8)
        rb.write(np.ones(2, np.float32))
        assert rb.read(3) is None

    def test_wraparound_integrity(self):
        rb = AudioRingBuffer(7)
        written = []
        read = []
        src = np.arange(100, dtype=np.float32)
        pos = 0
        for _ in range(50):
            chunk = src[pos : pos + 3]
            if rb.write(chunk):
                written.extend(chunk)
                pos += 3
            got = rb.read(2)
            if got is not None:
                read.extend(got)
        tail = rb.read(rb.available_to_read())
        read.extend(tail)
        np.testing.assert_array_equal(np.array(read), np.array(written))

    def test_clear(self):
        rb = AudioRingBuffer(8)
        rb.write(np.ones(5, np.float32))
        rb.clear()
        assert rb.available_to_read() == 0
        assert rb.available_to_write() == 8


class TestNegotiation:
    FULL = SinkCapability(supported_rates=tuple(
        PcmFormatSet.RATES_44K + PcmFormatSet.RATES_48K), name="full")
    LIMITED_192K = SinkCapability(supported_rates=(44100, 48000, 96000, 192000,
                                                   88200, 176400), name="192k")

    def test_family_detection(self):
        assert rate_family(44100) == 44
        assert rate_family(88200) == 44
        assert rate_family(48000) == 48
        assert rate_family(768000) == 48
        with pytest.raises(NegotiationError):
            rate_family(44101)

    def test_best_rate_targets_top_of_ladder(self):
        assert best_rate_for_family(44, self.FULL) == 705600
        assert best_rate_for_family(48, self.FULL) == 768000
        assert best_rate_for_family(44, self.LIMITED_192K) == 176400
        assert best_rate_for_family(48, self.LIMITED_192K) == 192000

    def test_ratio_restricted(self):
        assert calculate_upsample_ratio(44100, 705600) == 16
        assert calculate_upsample_ratio(352800, 705600) == 2
        with pytest.raises(NegotiationError):
            calculate_upsample_ratio(44100, 88100)
        with pytest.raises(NegotiationError):
            calculate_upsample_ratio(22050, 705600)  # ratio 32

    def test_negotiate_full_chain(self):
        neg = AutoNegotiator()
        r = neg.negotiate(44100, self.FULL)
        assert (r.output_rate, r.ratio, r.family) == (705600, 16, 44)
        assert r.requires_reconfiguration  # first config
        r2 = neg.negotiate(88200, self.FULL)
        assert not r2.requires_reconfiguration  # same family
        r3 = neg.negotiate(48000, self.FULL)
        assert r3.requires_reconfiguration  # family change
        assert (r3.output_rate, r3.ratio) == (768000, 16)

    def test_negotiate_limited_dac(self):
        r = AutoNegotiator().negotiate(48000, self.LIMITED_192K)
        assert (r.output_rate, r.ratio) == (192000, 4)


class TestDevices:
    def test_null_roundtrip(self):
        src = NullSource(channels=2, sample_rate=44100, total_frames=100)
        sink = NullSink()
        total = 0
        while True:
            x = src.read_frames(64)
            if x.shape[1] == 0:
                break
            sink.write_frames(x)
            total += x.shape[1]
        assert total == 100
        assert sink.frames_written == 100

    def test_loopback_pair(self, rng):
        lb = LoopbackPair(channels=2)
        x = rng.normal(size=(2, 50)).astype(np.float32)
        assert lb.sink_write(x)
        y = lb.source_read(50)
        np.testing.assert_array_equal(y, x)

    def test_open_specs(self, tmp_path):
        assert isinstance(open_source("null"), NullSource)
        assert isinstance(open_sink("null", 44100), NullSink)
        devices = list_devices()
        assert {"playback", "capture"} <= devices.keys()


class TestDither:
    """TPDF output dither (beyond reference: its float->int conversion only
    clamps and truncates, src/alsa/alsa_common.cpp:87-127)."""

    def test_default_path_unchanged(self, rng):
        x = rng.uniform(-1, 1, 4096).astype(np.float32)
        assert float_to_pcm(x, PcmFormat.S16_LE) == float_to_pcm(
            x, PcmFormat.S16_LE, ditherer=None
        )

    def test_sub_lsb_signal_survives(self, rng):
        # A constant 0.4-LSB signal truncates to silence undithered; TPDF
        # dither + rounding preserves its mean level.
        lsb = 1.0 / PcmFormat.S16_LE.scale
        x = np.full(200_000, 0.4 * lsb, dtype=np.float32)
        plain = np.frombuffer(float_to_pcm(x, PcmFormat.S16_LE), "<i2")
        assert np.all(plain == 0)
        d = TpdfDitherer(seed=1)
        vals = np.frombuffer(d.quantize(x, PcmFormat.S16_LE), "<i2")
        assert abs(vals.mean() - 0.4) < 0.01
        # Per-sample error is bounded by the 1-LSB noise + 0.5 rounding.
        assert np.max(np.abs(vals - 0.4)) <= 1.5 + 1e-6

    def test_error_white_not_correlated(self, rng):
        # Quantization error of a slow ramp should be decorrelated from the
        # signal (undithered truncation error is a sawtooth tracking it).
        lsb = 1.0 / PcmFormat.S16_LE.scale
        x = (np.linspace(0, 64, 500_000) * lsb).astype(np.float32)
        d = TpdfDitherer(seed=2)
        vals = np.frombuffer(d.quantize(x, PcmFormat.S16_LE), "<i2")
        err = vals - x / lsb
        ramp = x / lsb - np.mean(x / lsb)
        corr = abs(np.dot(err - err.mean(), ramp)) / (
            np.linalg.norm(err - err.mean()) * np.linalg.norm(ramp)
        )
        assert corr < 0.01

    def test_streaming_draws_fresh_noise(self):
        d = TpdfDitherer(seed=3)
        x = np.full(1000, 0.3 / PcmFormat.S16_LE.scale, dtype=np.float32)
        a = d.quantize(x, PcmFormat.S16_LE)
        b = d.quantize(x, PcmFormat.S16_LE)
        assert a != b  # stateful RNG advances between blocks
        assert (
            TpdfDitherer(seed=3).quantize(x, PcmFormat.S16_LE) == a
        )  # seeded reproducibility

    def test_full_scale_clamped(self):
        for fmt in PcmFormat:
            d = TpdfDitherer(seed=4)
            x = np.array([1.5, -1.5, 1.0, -1.0], dtype=np.float32)
            raw = d.quantize(np.tile(x, 100), fmt)
            hi = int(fmt.scale) - 1
            if fmt is PcmFormat.S16_LE:
                vals = np.frombuffer(raw, "<i2").astype(np.int64)
            elif fmt is PcmFormat.S32_LE:
                vals = np.frombuffer(raw, "<i4").astype(np.int64)
            else:
                tri = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
                vals = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
                vals = np.where(vals & 0x00800000, vals - (1 << 24), vals)
            assert vals.max() <= hi and vals.min() >= -int(fmt.scale)

    def test_sink_integration(self, tmp_path, rng):
        x = rng.uniform(-0.5, 0.5, (2, 4096)).astype(np.float32)
        sink = open_sink(str(tmp_path / "d.wav"), 44100, PcmFormat.S16_LE,
                         dither=True)
        sink.write_frames(x)
        sink.close()
        got, rate = read_wav(str(tmp_path / "d.wav"))
        assert rate == 44100
        lsb = 1.0 / PcmFormat.S16_LE.scale
        assert np.max(np.abs(got - x)) <= 1.6 * lsb


class TestOutputMetering:
    """StreamStats level meters (beyond reference: no signal levels in its
    stats surface)."""

    def test_known_sine_levels(self):
        from totton_tpu.io.stream import StreamStats

        st = StreamStats()
        t = np.arange(96000, dtype=np.float64)
        y = (0.5 * np.sin(2 * np.pi * 997 * t / 48000)).astype(np.float32)
        st.meter_output(y.reshape(1, -1))
        j = st.to_json()["output_level"]
        assert abs(j["peak_dbfs"] - 20 * np.log10(0.5)) < 0.05
        # sine RMS = A/sqrt(2) -> -9.03 dBFS at A=0.5
        assert abs(j["rms_dbfs"] - (20 * np.log10(0.5) - 3.01)) < 0.05
        assert j["clipped_samples"] == 0

    def test_clipping_counted_and_peak_accumulates(self):
        from totton_tpu.io.stream import StreamStats

        st = StreamStats()
        st.meter_output(np.full((2, 100), 0.25, np.float32))
        st.meter_output(np.array([[1.0, -1.2, 0.5, 2.0]], np.float32))
        j = st.to_json()["output_level"]
        assert j["clipped_samples"] == 3  # 1.0, -1.2, 2.0
        assert abs(j["peak_dbfs"] - 20 * np.log10(2.0)) < 0.05

    def test_empty_stream_levels_null(self):
        from totton_tpu.io.stream import StreamStats

        j = StreamStats().to_json()["output_level"]
        assert j["peak_dbfs"] is None and j["rms_dbfs"] is None
        assert j["clipped_samples"] == 0


class TestLiveDither:
    """RELOAD re-reads config's alsa.dither: sinks swap their output
    ditherer live (round-2 advisor: the web toggle silently required a
    restart)."""

    def test_raw_sink_toggles(self, tmp_path):
        from totton_tpu.io.devices import RawFileSink
        from totton_tpu.io.pcm import PcmFormat, TpdfDitherer

        sink = RawFileSink(str(tmp_path / "o.raw"), PcmFormat.S16_LE)
        assert sink._ditherer is None
        assert sink.set_dither(True) is True
        assert isinstance(sink._ditherer, TpdfDitherer)
        assert sink.set_dither(False) is True
        assert sink._ditherer is None
        sink.close()

    def test_wav_and_socket_sinks_support_it(self, tmp_path):
        from totton_tpu.io.devices import NullSink, WavFileSink
        from totton_tpu.io.sockets import SocketSink

        assert WavFileSink(str(tmp_path / "o.wav"), 44100).set_dither(True)
        assert hasattr(SocketSink, "set_dither")  # inherits the swap
        # Null sink does not quantize: reports not-applied.
        assert NullSink().set_dither(True) is False


class TestWavSinkStreaming:
    """WavFileSink streams quantized chunks to disk as they arrive (no
    full-stream RAM buffer), which makes set_dither genuinely live: audio
    written BEFORE a toggle keeps its original quantization."""

    def test_set_dither_is_not_retroactive(self, tmp_path, rng):
        from totton_tpu.io.devices import WavFileSink
        from totton_tpu.io.pcm import PcmFormat, float_to_pcm, interleave
        from totton_tpu.io.wav import read_wav

        x1 = (rng.normal(size=(2, 500)) * 0.2).astype(np.float32)
        x2 = (rng.normal(size=(2, 500)) * 0.2).astype(np.float32)

        path = str(tmp_path / "live.wav")
        sink = WavFileSink(path, 48000, PcmFormat.S16_LE)
        sink.write_frames(x1)
        assert sink.set_dither(True)
        sink.write_frames(x2)
        sink.close()

        import wave

        with wave.open(path, "rb") as w:
            raw = w.readframes(w.getnframes())
        # First chunk: bit-exact undithered quantization, untouched by the
        # later toggle. Second chunk: differs from plain truncation
        # (dither landed) but only by quantization-level amounts.
        first = raw[: 500 * 2 * 2]
        assert first == float_to_pcm(interleave(x1), PcmFormat.S16_LE)
        second = np.frombuffer(raw[500 * 2 * 2:], "<i2").astype(np.int32)
        plain = np.frombuffer(
            float_to_pcm(interleave(x2), PcmFormat.S16_LE), "<i2"
        ).astype(np.int32)
        assert np.any(second != plain)
        assert np.abs(second - plain).max() <= 2

        y, rate = read_wav(path)
        assert rate == 48000 and y.shape == (2, 1000)

    def test_empty_close_writes_valid_wav(self, tmp_path):
        from totton_tpu.io.devices import WavFileSink
        from totton_tpu.io.wav import read_wav

        path = str(tmp_path / "empty.wav")
        WavFileSink(path, 44100).close()
        y, rate = read_wav(path)
        assert rate == 44100 and y.shape[1] == 0

    def test_write_quantized_s16_passthrough(self, tmp_path, rng):
        from totton_tpu.io.devices import WavFileSink
        from totton_tpu.io.pcm import PcmFormat
        from totton_tpu.io.wav import read_wav

        q = (rng.integers(-30000, 30000, size=(2, 256))).astype(np.int16)
        path = str(tmp_path / "q.wav")
        sink = WavFileSink(path, 48000, PcmFormat.S16_LE)
        sink.write_quantized(q)
        sink.close()
        y, _ = read_wav(path)
        np.testing.assert_array_equal(
            np.round(y * 32768.0).astype(np.int16), q)
