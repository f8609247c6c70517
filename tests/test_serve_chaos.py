"""Serving-plane chaos test: adversarial client mix under live control.

A shared 6-slot server takes ~15 s of randomized abuse — normal
streams, mid-stream aborts, header-only silent connects, wrong-rate
rejects, flooding non-readers — interleaved with live EQ swaps and a
soft reset. Afterward the server must be fully consistent: every slot
released, a fresh healthy stream exact, stats coherent. This is the
serve analog of the reference's XRUN-recovery robustness surface
(src/alsa/alsa_common.cpp:269-336): faults are per-stream, never
systemic."""

import random
import socket
import threading
import time

import numpy as np

from totton_tpu.engine.upsampler import upsample_signal
from totton_tpu.io.pcm import interleave
from totton_tpu.io.sockets import HEADER_BYTES, pack_header
from totton_tpu.serve import StreamServer

from test_serve import RATE, _client_roundtrip, _filter, _free_port


def _behave_normal(port, lf, rng, errors, check_content=True):
    x = (rng.normal(size=(2, int(rng.integers(500, 4000)))) * 0.3
         ).astype(np.float32)
    try:
        y, _ = _client_roundtrip(port, x)
    except AssertionError:
        return  # rejected (all slots busy) — legitimate under chaos load
    if y.shape != (2, x.shape[1] * lf.ratio) or not np.all(np.isfinite(y)):
        errors.append(("normal stream structural failure", x.shape, y.shape))
        return
    if check_content:
        ref = upsample_signal(x, lf)
        if not np.allclose(y, ref, rtol=1e-5, atol=1e-6):
            errors.append(("normal stream mismatch", x.shape))


def _behave_abort(port, rng, errors):
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.sendall(pack_header(None, 2, RATE))
        hdr = b""
        while len(hdr) < HEADER_BYTES:
            got = s.recv(HEADER_BYTES - len(hdr))
            if not got:  # rejected (slots busy) - that's fine chaos too
                s.close()
                return
            hdr += got
        x = (rng.normal(size=(2, 1500)) * 0.3).astype(np.float32)
        s.sendall(interleave(x).astype("<f4").tobytes())
        time.sleep(float(rng.uniform(0, 0.05)))
        # Hard abort: RST if possible.
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     b"\x01\x00\x00\x00\x00\x00\x00\x00")
        s.close()
    except OSError:
        pass  # aborts racing the server's own teardown are fine


def _behave_silent(port, errors):
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        time.sleep(0.2)  # never sends a header
        s.close()
    except OSError:
        pass


def _behave_wrong_rate(port, errors):
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.settimeout(10)
        s.sendall(pack_header(None, 2, 96000))  # serving 44100
        got = s.recv(HEADER_BYTES)
        if got:
            errors.append(("wrong-rate client got a reply header",))
        s.close()
    except OSError:
        pass


def _behave_flood(port, rng, errors):
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.settimeout(0.15)
        s.sendall(pack_header(None, 2, RATE))
        hdr = b""
        while len(hdr) < HEADER_BYTES:
            got = s.recv(HEADER_BYTES - len(hdr))
            if not got:  # rejected (slots busy)
                s.close()
                return
            hdr += got
        raw = (rng.normal(size=(2, 4096)) * 0.3).astype(np.float32)
        payload = interleave(raw).astype("<f4").tobytes()
        deadline = time.monotonic() + 1.0
        while time.monotonic() < deadline:
            try:
                s.sendall(payload)  # never reads its output
            except (socket.timeout, OSError):
                break
        s.close()
    except OSError:
        pass


def test_chaos_mix_leaves_server_consistent(rng):
    lf = _filter()
    port = _free_port()
    srv = StreamServer(lf, f"tcp-listen://127.0.0.1:{port}", RATE,
                       max_streams=6, channels=2, swap_fade_frames=200,
                       max_input_backlog_blocks=16,
                       header_timeout_s=2.0)
    srv.start()
    errors: list = []
    try:
        seed = np.random.default_rng(42)
        threads = []
        behaviors = []
        for i in range(22):
            r = np.random.default_rng(1000 + i)
            kind = seed.integers(0, 10)
            if kind < 4:
                # Live swaps run concurrently, so mid-chaos content is
                # spectrum-dependent by design; check structure only.
                t = threading.Thread(target=_behave_normal,
                                     args=(port, lf, r, errors, False))
                behaviors.append("normal")
            elif kind < 6:
                t = threading.Thread(target=_behave_abort,
                                     args=(port, r, errors))
                behaviors.append("abort")
            elif kind < 7:
                t = threading.Thread(target=_behave_silent,
                                     args=(port, errors))
                behaviors.append("silent")
            elif kind < 8:
                t = threading.Thread(target=_behave_wrong_rate,
                                     args=(port, errors))
                behaviors.append("wrong_rate")
            else:
                t = threading.Thread(target=_behave_flood,
                                     args=(port, r, errors))
                behaviors.append("flood")
            threads.append(t)

        controls_done = threading.Event()

        def control_chaos():
            r = np.random.default_rng(7)
            for _ in range(4):
                time.sleep(float(r.uniform(0.3, 0.8)))
                srv.set_eq(np.linspace(float(r.uniform(0.5, 0.9)),
                                       float(r.uniform(1.0, 1.4)),
                                       srv.config.n_bins))
            srv.soft_reset()
            controls_done.set()

        ct = threading.Thread(target=control_chaos)
        ct.start()
        for i, t in enumerate(threads):
            t.start()
            time.sleep(float(seed.uniform(0.0, 0.12)))
        for t in threads:
            t.join(timeout=120)
        ct.join(timeout=120)
        assert controls_done.is_set()
        assert not errors, (errors, behaviors)

        # Every slot must eventually recycle (no leaked pending steps,
        # no stuck detached slots).
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            with srv._slot_lock:
                free = len(srv._free)
            if free == 6:
                break
            time.sleep(0.1)
        with srv._slot_lock:
            assert len(srv._free) == 6, (
                len(srv._free),
                [(s.index, s.detached, s.pending_steps, s.sock is not None)
                 for s in srv.slots])
        for s in srv.slots:
            assert s.pending_steps == 0

        # Restore the clean spectrum, then a fresh stream must be EXACT
        # (new attachments start unfaded on the current spectrum).
        swaps_before = srv.stats.spectrum_swaps
        srv.set_eq(None)
        deadline = time.monotonic() + 30
        while (srv.stats.spectrum_swaps <= swaps_before
               and time.monotonic() < deadline):
            time.sleep(0.02)
        x = (rng.normal(size=(2, 2500)) * 0.3).astype(np.float32)
        y, _ = _client_roundtrip(port, x)
        np.testing.assert_allclose(y, upsample_signal(x, lf),
                                   rtol=1e-5, atol=1e-6)
        # Stats coherent: accepted streams all finished or were cut.
        assert srv.stats.accepted >= behaviors.count("normal")
        assert srv.stats.rejected >= behaviors.count("wrong_rate")
    finally:
        srv.stop()


def test_chaos_repeat_different_seed(rng):
    """Second mix, different interleaving — chaos tests earn their keep
    through variety."""
    lf = _filter()
    port = _free_port()
    srv = StreamServer(lf, f"tcp-listen://127.0.0.1:{port}", RATE,
                       max_streams=4, channels=2,
                       max_input_backlog_blocks=16)
    srv.start()
    errors: list = []
    try:
        threads = []
        for i in range(16):
            r = np.random.default_rng(5000 + i)
            t = threading.Thread(
                target=[_behave_normal, _behave_abort, _behave_flood][i % 3],
                args=((port, lf, r, errors) if i % 3 == 0
                      else (port, r, errors)))
            threads.append(t)
            t.start()
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        # Wait for cut/aborted slots to recycle before the final client.
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            with srv._slot_lock:
                if len(srv._free) == 4:
                    break
            time.sleep(0.1)
        x = (rng.normal(size=(2, 1800)) * 0.3).astype(np.float32)
        y, _ = _client_roundtrip(port, x)
        np.testing.assert_allclose(y, upsample_signal(x, lf),
                                   rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()
