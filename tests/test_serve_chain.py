"""Serving + crossfeed composition across processes.

totton-serve's reply IS a valid totton wire stream (header at the
output rate + lossless f32 PCM), so it chains verbatim into a ratio-1
`totton-stream --crossfeed` stage — the deployment answer for
per-listener headphone crossfeed on served streams (a native
in-dispatcher crossfeed would need a second output-rate ring stage per
slot; chaining reuses the existing engines instead). This test runs the
real chain: StreamServer -> forwarder -> totton-stream subprocess with
--crossfeed, gated sample-level against the offline
upsample+crossfeed oracle."""

import socket
import subprocess
import sys
import threading
import time

import numpy as np

from totton_tpu.engine.chain import CrossfeedChain
from totton_tpu.engine.crossfeed import (
    CrossfeedFilter,
    CrossfeedProcessor,
    crossfeed_signal,
)
from totton_tpu.engine.upsampler import StreamingUpsampler, upsample_signal
from totton_tpu.filters.hrtf import generate_all
from totton_tpu.filters.sidecar import FilterSidecar, LoadedFilter
from totton_tpu.io.pcm import PcmFormat, interleave, pcm_to_float
from totton_tpu.io.sockets import HEADER_BYTES, pack_header
from totton_tpu.serve import StreamServer

from test_serve import RATE, _filter, _free_port


def _identity_filter() -> LoadedFilter:
    """The ratio-1 passthrough cli/stream.py builds for --ratio 1."""
    taps = np.zeros(1025, dtype=np.float32)
    taps[0] = 1.0
    return LoadedFilter(
        taps=taps,
        sidecar=FilterSidecar(
            coefficients_bin="<identity>", taps=1025, fft_size=4096,
            block_size=4096 - 1024, upsample_factor=1))


def test_serve_output_chains_into_crossfeed_stage(tmp_path, rng):
    lf = _filter()  # ratio 4: serve 44100 -> 176400
    cf_path = generate_all(tmp_path, sizes=["M"], families=["44k"])[0]
    cf = CrossfeedFilter.load(cf_path)
    out_rate = RATE * lf.ratio

    serve_port = _free_port()
    srv = StreamServer(lf, f"tcp-listen://127.0.0.1:{serve_port}", RATE,
                       max_streams=2, channels=2)
    srv.start()
    stage_port = _free_port()
    out_raw = tmp_path / "crossfed.raw"
    stage = subprocess.Popen(
        [sys.executable, "-m", "totton_tpu.cli.stream",
         "--in", f"tcp-listen://127.0.0.1:{stage_port}",
         "--out-file", str(out_raw), "--rate", str(out_rate),
         "--ratio", "1", "--crossfeed", str(cf_path),
         "--swap-fade", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        n = 5200
        x = (rng.normal(size=(2, n)) * 0.3).astype(np.float32)
        # Keep the chain inside PCM full scale: the stage's s32 file sink
        # clamps at +-1 (reference conversion semantics), while the toy
        # serve filter has arbitrary gain — scale the linear system's
        # input so the oracle peaks at 0.9.
        peak = float(np.max(np.abs(crossfeed_signal(
            upsample_signal(x, lf), cf))))
        x = (x * (0.9 / peak)).astype(np.float32)

        # Client leg: stream x through the serve plane.
        s = socket.create_connection(("127.0.0.1", serve_port), timeout=60)
        s.settimeout(60)
        s.sendall(pack_header(None, 2, RATE))

        def pump():
            s.sendall(interleave(x).astype("<f4").tobytes())
            s.shutdown(socket.SHUT_WR)

        t = threading.Thread(target=pump)
        t.start()
        reply = bytearray()
        while True:
            got = s.recv(65536)
            if not got:
                break
            reply += got
        t.join(timeout=60)
        s.close()
        assert len(reply) == HEADER_BYTES + n * lf.ratio * 2 * 4

        # Forward the serve reply VERBATIM (header included) into the
        # crossfeed stage — it is already a valid totton wire stream.
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                fwd = socket.create_connection(
                    ("127.0.0.1", stage_port), timeout=2)
                break
            except OSError:
                time.sleep(0.2)
        else:
            raise AssertionError(
                f"stage never listened: {stage.stdout.read()}")
        fwd.sendall(bytes(reply))
        fwd.shutdown(socket.SHUT_WR)
        fwd.close()
        assert stage.wait(timeout=300) == 0, stage.stdout.read()

        flat = pcm_to_float(out_raw.read_bytes(), PcmFormat.S32_LE)
        y = flat.reshape(-1, 2).T
        up = upsample_signal(x, lf)
        ref = crossfeed_signal(up, cf)
        # The ratio-1 chain carries the constant priming latency the
        # in-process chain reports.
        d = CrossfeedChain(
            StreamingUpsampler(_identity_filter(), channels=2),
            CrossfeedProcessor(cf)).latency
        assert y.shape == up.shape
        np.testing.assert_allclose(y[:, :d], 0, atol=1e-7)
        np.testing.assert_allclose(y[:, d:], ref[:, : ref.shape[1] - d],
                                   rtol=1e-4, atol=1e-5)
    finally:
        srv.stop()
        if stage.poll() is None:
            stage.kill()
            stage.wait()
