"""Multi-chip serving: the serve batch's slot rows sharded over a mesh.

Serving is embarrassingly row-parallel (tails are host-managed, so the
sharded step carries no ppermute/collectives); these tests run it on the
8-virtual-device CPU mesh and hold it to the same exactness bar as the
single-device plane: every concurrent stream equals its own
single-stream oracle, and the live control plane (crossfaded swaps)
works identically under sharding. SURVEY.md §2.3 charter; no reference
analog (one stream per process on one GPU)."""

import socket
import threading
import time

import numpy as np
import pytest

from totton_tpu.engine.upsampler import upsample_signal
from totton_tpu.parallel import make_mesh
from totton_tpu.serve import StreamServer

from test_serve import RATE, _client_roundtrip, _filter, _free_port


@pytest.fixture()
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(n_channel=8, n_time=1)


def _start(mesh, max_streams=16, fade=0):
    lf = _filter()
    port = _free_port()
    srv = StreamServer(lf, f"tcp-listen://127.0.0.1:{port}", RATE,
                       max_streams=max_streams, channels=2, mesh=mesh,
                       swap_fade_frames=fade)
    srv.start()
    return srv, lf, port


class TestShardedServe:
    def test_step_inputs_are_row_sharded(self, mesh8):
        srv, lf, port = _start(mesh8)
        try:
            z = srv._to_device(np.zeros((16, srv.config.halo_in),
                                        np.float32))
            assert len(z.sharding.device_set) == 8
            # dim 0 (rows) sharded, dim 1 replicated
            shard_shape = z.sharding.shard_shape(z.shape)
            assert shard_shape == (2, srv.config.halo_in)
        finally:
            srv.stop()

    def test_single_stream_exact(self, mesh8, rng):
        srv, lf, port = _start(mesh8)
        try:
            x = (rng.normal(size=(2, 5000)) * 0.3).astype(np.float32)
            y, out_rate = _client_roundtrip(port, x)
            assert out_rate == RATE * lf.ratio
            np.testing.assert_allclose(y, upsample_signal(x, lf),
                                       rtol=1e-5, atol=1e-6)
        finally:
            srv.stop()

    def test_concurrent_streams_isolated_on_mesh(self, mesh8, rng):
        """10 concurrent staggered clients on a sharded 16-slot server:
        total isolation, exact outputs, width transitions included."""
        srv, lf, port = _start(mesh8)
        try:
            signals = [(rng.normal(size=(2, 2200 + 301 * i)) * 0.3)
                       .astype(np.float32) for i in range(10)]
            results: dict[int, np.ndarray] = {}
            errors: list = []

            def run(i: int) -> None:
                try:
                    time.sleep(0.012 * i)
                    results[i] = _client_roundtrip(
                        port, signals[i], chunk=601, stagger_s=0.002)[0]
                except Exception as e:  # pragma: no cover
                    errors.append((i, e))

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(10)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not errors, errors
            assert len(results) == 10
            for i, y in results.items():
                np.testing.assert_allclose(
                    y, upsample_signal(signals[i], lf),
                    rtol=1e-5, atol=1e-6, err_msg=f"stream {i}")
        finally:
            srv.stop()

    def test_live_swap_crossfades_on_mesh(self, mesh8, rng):
        """The serving control plane works identically under sharding:
        set_eq mid-stream crossfades exactly (fade source dispatched on
        the same sharded step)."""
        FADE = 500
        srv, lf, port = _start(mesh8, fade=FADE)
        try:
            from test_serve import _control_client, _wait_counter

            block_in = srv.config.block_in
            ratio = srv.config.ratio
            p1 = (rng.normal(size=(2, 4 * block_in)) * 0.3).astype(np.float32)
            p2 = (rng.normal(size=(2, 6 * block_in)) * 0.3).astype(np.float32)
            x = np.concatenate([p1, p2], axis=1)
            eq = np.linspace(0.4, 1.2, srv.config.n_bins)

            s, send, read_exact, read_rest = _control_client(port)
            send(p1)
            y1 = read_exact(p1.shape[1] * ratio)
            srv.set_eq(eq)
            _wait_counter(lambda: srv.stats.spectrum_swaps, 1)
            send(p2)
            s.shutdown(socket.SHUT_WR)
            y2 = read_rest()
            s.close()

            n1 = p1.shape[1] * ratio
            ref_old = upsample_signal(x, lf)
            ref_new = upsample_signal(x, lf, eq_response=eq)
            np.testing.assert_allclose(y1, ref_old[:, :n1],
                                       rtol=1e-5, atol=1e-6)
            ramp = np.arange(FADE, dtype=np.float32) / FADE
            expect2 = ref_new[:, n1:].copy()
            expect2[:, :FADE] = (ref_old[:, n1:n1 + FADE] * (1.0 - ramp)
                                 + ref_new[:, n1:n1 + FADE] * ramp)
            np.testing.assert_allclose(y2, expect2, rtol=1e-4, atol=1e-5)
        finally:
            srv.stop()

    def test_indivisible_width_rejected(self, mesh8):
        # 4 slots x 1 channel = 4 rows cannot shard over 8 devices.
        with pytest.raises(ValueError, match="shards"):
            StreamServer(_filter(), "tcp-listen://127.0.0.1:0", RATE,
                         max_streams=4, channels=1, mesh=mesh8)
