"""Serving-shape throughput: the batched multi-stream step.

totton-serve dispatches [slots * channels, block_in] single-block steps
(totton_tpu/serve.py) — per-slot tails as explicit rows. This measures
the chained (device-serial) rate of EXACTLY that dispatch shape at the
production 16x/80k-tap geometry, giving the serving compute ceiling and
the per-stream realtime multiple with every slot busy.

  python -m benchmarks.bench_serve [--slots 8,64] [--k-chain 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import totton_tpu  # noqa: F401


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="8,64")
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--k-chain", type=int, default=20)
    ap.add_argument("--bank", type=int, default=80000,
                    choices=[80000, 8000],
                    help="filter geometry: production 80k (fft 131072) "
                         "or the low-latency 8k bank (fft 16384)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from totton_tpu.ops import overlap_save as osv

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    if args.bank == 80000:
        cfg = osv.OverlapSaveConfig(taps=80001, fft_size=131072,
                                    block_size=51072, ratio=16)
    else:  # low-latency bank geometry (bench_latency.py rationale)
        cfg = osv.OverlapSaveConfig(taps=8001, fft_size=16384,
                                    block_size=8384, ratio=16)
    n = np.arange(cfg.taps) - (cfg.taps - 1) / 2
    h = np.sinc(n / 16) * np.kaiser(cfg.taps, 25.0)
    h *= 16 * 0.99 / h.sum()
    hr, hi = osv.filter_spectrum(h, cfg.fft_size)
    rng = np.random.default_rng(0)

    for slots in [int(s) for s in args.slots.split(",")]:
        rows = slots * args.channels
        step = osv.make_block_step(cfg)
        x = jax.device_put(jnp.asarray(
            (rng.normal(size=(rows, cfg.block_in)) * 0.3)
            .astype(np.float32)))
        tails = jax.device_put(jnp.asarray(
            (rng.normal(size=(rows, cfg.halo_in)) * 0.3)
            .astype(np.float32)))

        def chain(a0, t0, xa, r_, i_):
            def body(carry, _):
                acc, t = carry
                y, t2 = step(t, xa * (1.0 + 1e-6 * acc), (r_, i_))
                return (acc + jnp.sum(jnp.abs(y)), t2), None

            return jax.lax.scan(body, (a0, t0), None,
                                length=args.k_chain)[0][0]

        fused = jax.jit(chain)
        t0 = time.monotonic()
        v = float(fused(jnp.float32(0), tails, x, hr, hi))
        print(f"[slots={slots}] first call: {time.monotonic() - t0:.1f}s",
              file=sys.stderr)
        assert np.isfinite(v) and v > 0
        best = float("inf")
        for t in range(3):
            t0 = time.monotonic()
            float(fused(jnp.float32(1e-6 * t), tails, x, hr, hi))
            best = min(best, time.monotonic() - t0)
        out = rows * cfg.block_size * args.k_chain
        sps = out / best
        per_stream_rt = sps / slots / (args.channels * 705600.0)
        print(json.dumps({
            "exp": "serve_step_rate", "slots": slots,
            "channels": args.channels,
            "step_ms": round(best / args.k_chain * 1e3, 3),
            "g_samples_per_s": round(sps / 1e9, 3),
            "per_stream_realtime_x": round(per_stream_rt, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
