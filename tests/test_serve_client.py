"""ServeClient / totton-serve-client: the supported consumer surface of
the totton-serve wire protocol (totton_tpu/io/serve_client.py). The
protocol itself is gated by tests/test_serve.py's hand-rolled clients;
here the LIBRARY and CLI must produce the same oracle-exact streams."""

import socket
import threading
import time

import numpy as np
import pytest

from totton_tpu.engine.upsampler import upsample_signal
from totton_tpu.filters.sidecar import FilterSidecar, LoadedFilter
from totton_tpu.io.pcm import PcmFormat, float_to_pcm, pcm_to_float
from totton_tpu.io.serve_client import ServeClient
from totton_tpu.io.wav import read_wav, write_wav
from totton_tpu.serve import StreamServer

RATE = 44100


def _filter(taps=33, fft=256, ratio=4, seed=5):
    rng = np.random.default_rng(seed)
    h = (rng.normal(size=taps) * np.exp(-np.arange(taps) * 3.0 / taps))
    return LoadedFilter(
        taps=h.astype(np.float32),
        sidecar=FilterSidecar(
            coefficients_bin="<test>", taps=taps, fft_size=fft,
            block_size=fft - (taps - 1), upsample_factor=ratio,
        ),
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture()
def server():
    lf = _filter()
    port = _free_port()
    srv = StreamServer(lf, f"tcp-listen://127.0.0.1:{port}", RATE,
                       max_streams=4, channels=2)
    srv.start()
    yield srv, lf, port
    srv.stop()


class TestServeClient:
    def test_upsample_matches_oracle(self, server, rng):
        srv, lf, port = server
        x = (rng.normal(size=(2, 6000)) * 0.3).astype(np.float32)
        with ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE) as c:
            assert c.output_rate == RATE * lf.ratio
            assert c.ratio == lf.ratio
            y = c.upsample(x)
        np.testing.assert_allclose(y, upsample_signal(x, lf),
                                   rtol=1e-5, atol=1e-6)

    def test_s16_wire_format(self, server, rng):
        """The PCM wire encoding quantizes at the client and the server
        round-trips it bit-exactly: oracle = upsample of the decoded
        s16 signal, output re-quantized."""
        srv, lf, port = server
        x = (rng.normal(size=(2, 3000)) * 0.3).astype(np.float32)

        def s16(a):
            flat = a.T.reshape(-1)
            return (pcm_to_float(float_to_pcm(flat, PcmFormat.S16_LE),
                                 PcmFormat.S16_LE)
                    .reshape(-1, a.shape[0]).T)

        with ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE,
                         fmt=PcmFormat.S16_LE) as c:
            y = c.upsample(x)
        np.testing.assert_allclose(
            y, s16(upsample_signal(s16(x), lf)), rtol=1e-4, atol=1e-6)

    def test_per_stream_eq_block(self, server, rng):
        srv, lf, port = server
        x = (rng.normal(size=(2, 3000)) * 0.3).astype(np.float32)
        with ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE,
                         eq_text="Preamp: -12 dB\n") as c:
            y = c.upsample(x)
        gain = np.float32(10.0 ** (-12 / 20.0))
        np.testing.assert_allclose(y, upsample_signal(x * gain, lf),
                                   rtol=1e-4, atol=1e-6)

    def test_incremental_read_write(self, server, rng):
        """send/read interleaved by hand (no convenience pump)."""
        srv, lf, port = server
        x = (rng.normal(size=(2, 4000)) * 0.3).astype(np.float32)
        c = ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE)
        parts = []
        done = threading.Event()

        def pump():
            for i in range(0, x.shape[1], 500):
                c.send(x[:, i:i + 500])
                time.sleep(0.01)
            c.end_input()
            done.set()

        t = threading.Thread(target=pump)
        t.start()
        while (y := c.read_frames()) is not None:
            parts.append(y)
        t.join()
        c.close()
        np.testing.assert_allclose(np.concatenate(parts, axis=1),
                                   upsample_signal(x, lf),
                                   rtol=1e-5, atol=1e-6)

    def test_listen_spec_rejected(self):
        with pytest.raises(ValueError, match="listen"):
            ServeClient("tcp-listen://127.0.0.1:9", 2, RATE)

    def test_channel_mismatch_rejected(self, server, rng):
        srv, lf, port = server
        with ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE) as c:
            with pytest.raises(ValueError, match="channels"):
                c.send(np.zeros((4, 100), np.float32))


class TestCli:
    def test_wav_through_server_to_wav(self, server, rng, tmp_path):
        from totton_tpu.cli.serve_client import main

        srv, lf, port = server
        x = (rng.normal(size=(2, 5000)) * 0.3).astype(np.float32)
        src = tmp_path / "in.wav"
        dst = tmp_path / "out.wav"
        write_wav(str(src), x, RATE, PcmFormat.S24_3LE)
        rc = main(["--server", f"tcp://127.0.0.1:{port}",
                   "--in", str(src), "--out", str(dst),
                   "--format", "s24"])
        assert rc == 0
        y, out_rate = read_wav(str(dst))
        assert out_rate == RATE * lf.ratio
        # Oracle: the WAV round-trip quantizes input at s24; output is
        # quantized at s24 by the sink.
        xs, _ = read_wav(str(src))
        # The s24 sink clamps like float_to_pcm; clamp the oracle too
        # (the unnormalized test filter overshoots full scale).
        ref = np.clip(upsample_signal(xs, lf), -1.0,
                      PcmFormat.S24_3LE.clamp_hi)
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=2e-7 * 32)

    def test_bad_server_exits_1(self, tmp_path, rng):
        from totton_tpu.cli.serve_client import main

        src = tmp_path / "in.wav"
        write_wav(str(src),
                  (rng.normal(size=(2, 100)) * 0.3).astype(np.float32),
                  RATE, PcmFormat.S16_LE)
        rc = main(["--server", f"tcp://127.0.0.1:{_free_port()}",
                   "--in", str(src), "--out", str(tmp_path / "o.wav"),
                   "--connect-window", "0.5"])
        assert rc == 1

    def test_missing_rate_exits_2(self, server, tmp_path):
        from totton_tpu.cli.serve_client import main

        srv, lf, port = server
        raw = tmp_path / "in.raw"
        raw.write_bytes(b"\x00" * 400)
        rc = main(["--server", f"tcp://127.0.0.1:{port}",
                   "--in", str(raw), "--out", "null"])
        assert rc == 2
