"""totton-serve: multi-stream upsampling server (one chip, many streams).

Serves N independent client audio streams from one batched engine step
(totton_tpu/serve.py design note). Each client opens one duplex TCP/unix
connection, sends the 12-byte totton header + PCM at --rate, and reads
back the upsampled stream at rate*ratio on the same connection:

  totton-serve --listen tcp-listen://:9100 --rate 44100 --ratio 16 \\
      --filter-dir data/coefficients --max-streams 64

Exit codes: 0 ok, 1 runtime failure, 2 bad arguments.
"""

from __future__ import annotations

import argparse
import signal
import sys

from totton_tpu.engine.selector import FilterSelectionError, resolve_filter_path
from totton_tpu.eq.apo import parse_eq_file
from totton_tpu.eq.biquad import profile_response_for_fft
from totton_tpu.filters.sidecar import load_filter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="totton-serve", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--listen", required=True,
                   help="listen endpoint (tcp-listen://[host]:port | "
                        "unix-listen:/path)")
    p.add_argument("--rate", type=int, required=True,
                   help="input sample rate every client must use (Hz)")
    p.add_argument("--ratio", type=int, default=16,
                   choices=[2, 4, 8, 16], help="upsample ratio")
    p.add_argument("--filter", help="filter JSON path")
    p.add_argument("--filter-dir", default="data/coefficients")
    p.add_argument("--phase", default="min",
                   choices=["min", "minimum", "linear"])
    p.add_argument("--channels", type=int, default=2,
                   help="channels per stream")
    p.add_argument("--max-streams", type=int, default=64,
                   help="concurrent stream slots (static batch rows)")
    p.add_argument("--max-blocks-per-step", type=int, default=16,
                   help="adaptive per-step block depth cap (power of two; "
                        "bursty clients batch up to this many filter "
                        "blocks per dispatch)")
    p.add_argument("--eq-profile",
                   help="Equalizer-APO profile baked into the served "
                        "spectrum (shared by all streams)")
    p.add_argument("--stats-path",
                   help="write aggregate + per-stream stats JSON here")
    p.add_argument("--duration", type=float,
                   help="serve for this many seconds then exit (tests)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        path = resolve_filter_path(
            filter_path=args.filter, filter_dir=args.filter_dir,
            phase=args.phase, ratio=args.ratio, input_rate=args.rate)
        loaded = load_filter(path)
    except (FilterSelectionError, ValueError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    eq = None
    if args.eq_profile:
        try:
            profile = parse_eq_file(args.eq_profile)
            eq = profile_response_for_fft(
                profile, loaded.sidecar.fft_size, args.rate * loaded.ratio)
        except (OSError, ValueError) as e:
            print(f"error: --eq-profile: {e}", file=sys.stderr)
            return 1

    from totton_tpu.serve import StreamServer

    try:
        server = StreamServer(
            loaded, args.listen, args.rate, max_streams=args.max_streams,
            channels=args.channels, eq_response=eq,
            stats_path=args.stats_path,
            max_blocks_per_step=args.max_blocks_per_step)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    stop_count = {"n": 0}

    def handle_signal(signum, frame):
        stop_count["n"] += 1
        if stop_count["n"] >= 2:
            import os

            os._exit(1)
        # Graceful: stop accepting, let active streams finish (bounded),
        # then stop. Second signal hard-exits.
        import threading

        def _drain():
            server.drain(timeout_s=30.0)
            server._stop.set()
            server._kick.set()

        threading.Thread(target=_drain, daemon=True,
                         name="totton-serve-drain").start()

    signal.signal(signal.SIGINT, handle_signal)
    signal.signal(signal.SIGTERM, handle_signal)

    server.start()
    print(f"Serving on {args.listen}: {args.max_streams} stream slots, "
          f"{args.rate} Hz -> {args.rate * loaded.ratio} Hz "
          f"({loaded.sidecar.taps} taps)", file=sys.stderr)
    server.wait(args.duration)
    server.stop()
    j = server.stats.to_json(0, [])
    print(f"Served {j['streams']['accepted']} streams "
          f"({j['steps']} steps, {j['frames_out']} frames out)",
          file=sys.stderr)
    print("Serving stopped", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
