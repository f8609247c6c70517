"""Full-stack serving e2e on the real chip: live control + drain A/B.

Spawns the real totton-serve process (production 16x/80k-tap bank),
drives N concurrent s16 client streams over loopback TCP, flips the
phase live via ZMQ mid-stream (per-stream crossfade), and reports the
server's own stats: steps_by_shape (adaptive width), per-stream latency
percentiles, avg_step_drain_ms. With --ab-device-pcm it runs the same
load twice — float drain vs on-device s16 drain — and prints the
drain-time delta (the device->host bytes halve).

  python -m benchmarks.bench_serve_e2e [--streams 8] [--seconds 1.0]
      [--ab-device-pcm]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from totton_tpu.io.pcm import PcmFormat
from totton_tpu.io.serve_client import ServeClient

RATE = 44100


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _client(port, x, results, errors, i):
    try:
        with ServeClient(f"tcp://127.0.0.1:{port}", 2, RATE,
                         fmt=PcmFormat.S16_LE, timeout_s=600,
                         connect_window_s=600) as c:
            y = c.upsample(x, chunk_frames=8192)
        results[i] = y.shape[1]
    except Exception as e:  # noqa: BLE001
        errors.append((i, e))


def run_once(streams: int, seconds: float, device_pcm: bool,
             repo: str, depth: int = 4, latency: str = "normal") -> dict:
    port = _free_port()
    stats_path = f"/tmp/bench_serve_e2e_{port}.json"
    endpoint = f"ipc:///tmp/bench_serve_e2e_{port}.sock"
    cmd = [sys.executable, "-m", "totton_tpu.cli.serve",
           "--listen", f"tcp-listen://127.0.0.1:{port}",
           "--rate", str(RATE), "--ratio", "16",
           "--filter-dir", os.path.join(repo, "data", "coefficients"),
           "--max-streams", str(streams),
           "--latency", latency,
           "--max-blocks-per-step", str(depth),
           "--swap-fade", "4096",
           "--control-endpoint", endpoint,
           "--stats-path", stats_path,
           "--duration", "3600"]
    if device_pcm:
        cmd.append("--device-pcm")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        from totton_tpu.control.client import DaemonClient

        client = DaemonClient(endpoint=endpoint, timeout_ms=30000)
        deadline = time.monotonic() + 1800  # warmup compiles
        while time.monotonic() < deadline:
            if client.ping():
                break
            time.sleep(1.0)
        else:
            proc.kill()
            raise RuntimeError("server never served PING")

        n = int(RATE * seconds)
        rng = np.random.default_rng(1)
        sigs = [(rng.normal(size=(2, n)) * 0.3).astype(np.float32)
                for _ in range(streams)]
        results: dict[int, int] = {}
        errors: list = []
        t0 = time.monotonic()
        threads = [threading.Thread(target=_client,
                                    args=(port, sigs[i], results, errors, i))
                   for i in range(streams)]
        for t in threads:
            t.start()
        # Live phase flip mid-stream (the round-5 control plane).
        time.sleep(max(0.3, seconds / 3))
        r = client.set_phase_type("linear")
        assert r.ok, r
        for t in threads:
            t.join(timeout=900)
        wall = time.monotonic() - t0
        assert not errors, errors
        for i, frames in results.items():
            assert frames == sigs[i].shape[1] * 16, (i, frames)
        time.sleep(0.7)  # final stats flush
        stats = json.loads(open(stats_path).read())
        out = {
            "device_pcm": device_pcm,
            "streams": streams,
            "wall_s": round(wall, 2),
            "frames_out_total": sum(results.values()),
            "steps": stats["steps"],
            "steps_by_shape": stats["steps_by_shape"],
            "spectrum_swaps": stats["spectrum_swaps"],
            "avg_step_drain_ms": stats["avg_step_drain_ms"],
        }
        assert client.shutdown().ok
        proc.wait(timeout=120)
        return out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--depth", type=int, default=4,
                    help="--max-blocks-per-step (1 gives the most steps "
                         "for a stable drain average)")
    ap.add_argument("--latency", default="normal",
                    choices=["normal", "low"],
                    help="filter bank (low = bundled 8k / ~12 ms)")
    ap.add_argument("--ab-device-pcm", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    a = run_once(args.streams, args.seconds, False, repo, depth=args.depth,
                 latency=args.latency)
    print(json.dumps(a), flush=True)
    if args.ab_device_pcm:
        b = run_once(args.streams, args.seconds, True, repo,
                     depth=args.depth, latency=args.latency)
        print(json.dumps(b), flush=True)
        if a["avg_step_drain_ms"] and b["avg_step_drain_ms"]:
            print(f"drain A/B: float {a['avg_step_drain_ms']} ms -> "
                  f"s16 {b['avg_step_drain_ms']} ms "
                  f"({100 * (b['avg_step_drain_ms'] / a['avg_step_drain_ms'] - 1):+.0f}%)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
