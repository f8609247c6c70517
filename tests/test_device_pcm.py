"""On-device s16 PCM quantization (ops/device_pcm.py + engine device-PCM
mode): bit-compatibility with the host conversion path (which is itself
bit-exact with the reference's C casts, src/alsa/alsa_common.cpp:87-127),
end-to-end session parity, and the dithered quantizer's contract."""

import subprocess
import sys

import numpy as np
import pytest

from totton_tpu.engine.upsampler import StreamingUpsampler
from totton_tpu.filters.sidecar import load_filter
from totton_tpu.io.devices import NullSink, RawFileSink, open_source
from totton_tpu.io.pcm import (
    PcmFormat,
    TpdfDitherer,
    float_to_pcm,
    quantize_s16_host,
)
from totton_tpu.io.stream import StreamSession, ThreadedStreamSession
from totton_tpu.io.wav import write_wav
from totton_tpu.ops import device_pcm


def _edge_vector():
    rng = np.random.default_rng(7)
    x = (rng.normal(size=4096) * 0.5).astype(np.float32)
    edges = np.array(
        [0.0, 1.0, -1.0, 1.5, -1.5, 0.9999695, -0.9999695, 0.99997,
         0.5, -0.5, 1e-9, -1e-9, 3.0517578e-05, -3.0517578e-05],
        dtype=np.float32)
    return np.concatenate([edges, x])


class TestDeviceQuantizer:
    def test_matches_host_cast_bit_exact(self):
        x = _edge_vector()
        dev = np.asarray(device_pcm.quantize_s16(x))
        host = np.frombuffer(float_to_pcm(x, PcmFormat.S16_LE), "<i2")
        assert dev.dtype == np.int16
        np.testing.assert_array_equal(dev, host)

    def test_matches_quantize_s16_host_helper(self):
        x = _edge_vector().reshape(2, -1)
        np.testing.assert_array_equal(
            np.asarray(device_pcm.quantize_s16(x)), quantize_s16_host(x))

    def test_dithered_within_one_lsb_of_round_nearest(self):
        import jax

        x = (np.random.default_rng(3).normal(size=8192) * 0.4).astype(
            np.float32)
        key = jax.random.PRNGKey(0)
        q = np.asarray(device_pcm.quantize_s16_dithered(
            x, key, np.uint32(1)))
        exact = np.clip(x, -1.0, 0.9999695).astype(np.float64) * 32768.0
        # TPDF in [-1, 1) around round-to-nearest: |err| <= 1.5 LSB.
        assert np.all(np.abs(q - exact) <= 1.5)
        # Unbiased on average (TPDF is zero-mean).
        assert abs(float(np.mean(q - exact))) < 0.05

    def test_dither_reproducible_and_block_unique(self):
        import jax

        x = np.zeros(4096, np.float32) + 1e-4
        key = jax.random.PRNGKey(42)
        a = np.asarray(device_pcm.quantize_s16_dithered(x, key, np.uint32(5)))
        b = np.asarray(device_pcm.quantize_s16_dithered(x, key, np.uint32(5)))
        c = np.asarray(device_pcm.quantize_s16_dithered(x, key, np.uint32(6)))
        np.testing.assert_array_equal(a, b)
        assert np.any(a != c)  # fresh noise per dispatch counter

    def test_full_scale_rails(self):
        import jax

        x = np.array([2.0, -2.0, 1.0, -1.0], np.float32)
        q = np.asarray(device_pcm.quantize_s16_dithered(
            x, jax.random.PRNGKey(0), np.uint32(0)))
        assert q.max() <= 32767 and q.min() >= -32768


class TestEngineDevicePcm:
    def test_rejects_non_s16(self, coefficients_dir):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        with pytest.raises(ValueError, match="S16_LE only"):
            StreamingUpsampler(lf, channels=2,
                               device_pcm=PcmFormat.S24_3LE)

    def test_bit_exact_vs_float_engine(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        block = lf.sidecar.block_size // lf.ratio
        x = (rng.normal(size=(2, 2 * block)) * 0.4).astype(np.float32)

        eng_f = StreamingUpsampler(lf, channels=2)
        eng_q = StreamingUpsampler(lf, channels=2,
                                   device_pcm=PcmFormat.S16_LE)
        y_f = eng_f.process_block(x)
        y_q = eng_q.process_block(x)
        assert y_q.dtype == np.int16
        np.testing.assert_array_equal(y_q, quantize_s16_host(y_f))

    def test_fade_path_keeps_dtype_contract(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        block = lf.sidecar.block_size // lf.ratio
        x = (rng.normal(size=(2, block)) * 0.3).astype(np.float32)
        eng = StreamingUpsampler(lf, channels=2, swap_fade_frames=256,
                                 device_pcm=PcmFormat.S16_LE)
        eng.process_block(x)
        eng.set_eq(None)  # arms the crossfade (same spectrum -> same audio)
        y = eng.process_block(x)
        assert y.dtype == np.int16
        # EQ "swap" to the identical spectrum: the faded dispatch must
        # still match the unfaded engine bit-exactly (old == new output).
        ref = StreamingUpsampler(lf, channels=2,
                                 device_pcm=PcmFormat.S16_LE)
        ref.process_block(x)
        np.testing.assert_array_equal(y, ref.process_block(x))

    def test_set_dither_live(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        block = lf.sidecar.block_size // lf.ratio
        x = (rng.normal(size=(2, block)) * 0.2).astype(np.float32)
        eng = StreamingUpsampler(lf, channels=2,
                                 device_pcm=PcmFormat.S16_LE)
        base = eng.process_block(x)
        assert eng.set_dither(True) is True
        eng.reset()
        dithered = eng.process_block(x)
        assert np.any(dithered != base)
        assert np.all(np.abs(dithered.astype(np.int32)
                             - base.astype(np.int32)) <= 2)
        # Float engines don't own quantization: the toggle belongs to the
        # sink there.
        assert StreamingUpsampler(lf, channels=2).set_dither(True) is False


class TestSessionDevicePcm:
    def _raw_bytes(self, tmp_path, name, lf, x, device: bool,
                   threaded: bool = False):
        wav_in = str(tmp_path / f"{name}.wav")
        write_wav(wav_in, x, 352800)
        out = tmp_path / f"{name}.raw"
        eng = StreamingUpsampler(
            lf, channels=2,
            device_pcm=PcmFormat.S16_LE if device else None)
        sink = RawFileSink(str(out), PcmFormat.S16_LE)
        cls = ThreadedStreamSession if threaded else StreamSession
        stats = cls(open_source(wav_in), sink, eng).run()
        sink.close()
        return out.read_bytes(), stats

    def test_stream_session_bit_exact(self, coefficients_dir, rng, tmp_path):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        x = (rng.normal(size=(2, 5000)) * 0.3).astype(np.float32)
        dev, stats_d = self._raw_bytes(tmp_path, "dev", lf, x, device=True)
        host, stats_h = self._raw_bytes(tmp_path, "host", lf, x, device=False)
        assert dev == host and len(dev) == 5000 * 2 * 2 * 2
        # Metering survives the quantized domain (same signal, same levels
        # within the 16-bit floor).
        d, h = stats_d.to_json()["output_level"], stats_h.to_json()[
            "output_level"]
        assert abs(d["peak_dbfs"] - h["peak_dbfs"]) < 0.01
        assert abs(d["rms_dbfs"] - h["rms_dbfs"]) < 0.01
        assert d["clipped_samples"] == 0

    def test_threaded_session_bit_exact(self, coefficients_dir, rng,
                                        tmp_path):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        x = (rng.normal(size=(2, 4000)) * 0.3).astype(np.float32)
        dev, _ = self._raw_bytes(tmp_path, "tdev", lf, x, device=True,
                                 threaded=True)
        host, _ = self._raw_bytes(tmp_path, "thost", lf, x, device=False,
                                  threaded=True)
        assert dev == host

    def test_null_sink_counts_quantized(self):
        sink = NullSink()
        sink.write_quantized(np.zeros((2, 64), np.int16))
        assert sink.frames_written == 64


class TestCliDevicePcm:
    def _run(self, args):
        return subprocess.run(
            [sys.executable, "-m", "totton_tpu.cli.stream", *args],
            capture_output=True, text=True, timeout=600)

    def test_auto_on_for_s16_and_bit_exact(self, coefficients_dir, rng,
                                           tmp_path):
        x = (rng.normal(size=(2, 3000)) * 0.3).astype(np.float32)
        wav_in = str(tmp_path / "in.wav")
        write_wav(wav_in, x, 352800)
        filt = str(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        outs = {}
        for mode in ("auto", "off"):
            out = str(tmp_path / f"out_{mode}.raw")
            r = self._run(["--in", wav_in, "--out", f"file:{out}",
                           "--filter", filt, "--format", "s16",
                           "--device-pcm", mode])
            assert r.returncode == 0, r.stderr
            assert ("Device PCM" in r.stderr) == (mode == "auto")
            outs[mode] = open(out, "rb").read()
        assert outs["auto"] == outs["off"] and len(outs["auto"]) > 0

    def test_sharded_auto_on(self, coefficients_dir, rng, tmp_path):
        x = (rng.normal(size=(2, 3000)) * 0.3).astype(np.float32)
        wav_in = str(tmp_path / "in.wav")
        write_wav(wav_in, x, 352800)
        filt = str(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        out = str(tmp_path / "out_sharded.raw")
        r = self._run(["--in", wav_in, "--out", f"file:{out}",
                       "--filter", filt, "--format", "s16",
                       "--shard-time", "2"])
        assert r.returncode == 0, r.stderr
        assert "Device PCM: s16 quantization on-device (sharded drain)" \
            in r.stderr
        # --dither keeps sharded meshes on the float path (undithered-only
        # sharded quantize, parallel/sharded.py note).
        r2 = self._run(["--in", wav_in, "--out", "null",
                        "--filter", filt, "--format", "s16",
                        "--shard-time", "2", "--dither"])
        assert r2.returncode == 0, r2.stderr
        assert "Device PCM" not in r2.stderr

    def test_on_requires_s16(self, tmp_path, coefficients_dir):
        filt = str(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        r = self._run(["--in", "null", "--out", "null", "--rate", "352800",
                       "--filter", filt, "--format", "s32",
                       "--device-pcm", "on", "--duration", "0.01"])
        assert r.returncode == 2
        assert "requires --format s16" in r.stderr
