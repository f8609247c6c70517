"""Live-streaming step-rate probe: the latency-bounded BASELINE config.

The live-reload streaming config dispatches small granules (bounded
latency) instead of the deep offline batches, which leaves the MXU
row-starved: a 16-block stereo step is only 32 frames = matmul M=32
against the 128-lane systolic array. This sweep measures the chained
(device-serial) step rate across dispatch granules and kernel tunings to
find the operating point for the live config, plus the reload latency at
each granule.

  python -m benchmarks.bench_live [--blocks 16,32,64,128] \
      [--inv-q2 0,256] [--k-chain 20]

Prints one JSON line per variant (chained methodology — see bench.py).
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
    ap.add_argument("--blocks", default="16,32,64,128")
    ap.add_argument("--inv-q2", default="0,256")
    ap.add_argument("--fwd-p", default="0",
                    help="comma list of forward split P values "
                         "(KernelTuning.fwd_p; 0 = auto)")
    ap.add_argument("--forms", default="stacked2")
    ap.add_argument("--k-chain", type=int, default=20)
    ap.add_argument("--min-frames", type=int, default=None,
                    help="override KernelTuning.min_frames (e.g. 10**9 "
                         "forces the folded pipeline at every granule)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from totton_tpu.ops import overlap_save as osv

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    cfg = osv.OverlapSaveConfig(taps=80001, fft_size=131072,
                                block_size=51072, ratio=16)
    n = np.arange(cfg.taps) - (cfg.taps - 1) / 2
    h = np.sinc(n / 16) * np.kaiser(cfg.taps, 25.0)
    h *= 16 * 0.99 / h.sum()
    hr, hi = osv.filter_spectrum(h, cfg.fft_size)

    channels = 2
    rng = np.random.default_rng(0)
    y_ref: dict[int, float] = {}

    for blocks in [int(b) for b in args.blocks.split(",")]:
        x = jax.device_put(jnp.asarray(
            (rng.normal(size=(channels,
                              cfg.halo_in + blocks * cfg.block_in))
             * 0.3).astype(np.float32)))
        for form in args.forms.split(","):
            for q2, fp in ((q, p)
                           for q in [int(v) for v in args.inv_q2.split(",")]
                           for p in [int(v) for v in args.fwd_p.split(",")]):
                kw = {"form": form, "inv_q2": q2, "fwd_p": fp}
                if args.min_frames is not None:
                    kw["min_frames"] = args.min_frames
                tuning = osv.KernelTuning(**kw)
                label = f"b={blocks},{form},q2={q2 or 'auto'}"
                if fp:
                    label += f",p={fp}"

                def chain(a0, xa, r_, i_):
                    def body(acc, _):
                        y = osv.upsample_blocks(
                            xa * (1.0 + 1e-6 * acc), (r_, i_), cfg, tuning)
                        return acc + jnp.sum(jnp.abs(y)), None

                    return jax.lax.scan(body, a0, None,
                                        length=args.k_chain)[0]

                fused = jax.jit(chain)
                t0 = time.monotonic()
                v = float(fused(jnp.float32(0), x, hr, hi))
                print(f"[{label}] first call: "
                      f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
                assert np.isfinite(v) and v > 0
                # Equivalence across tunings at the same granule.
                if blocks not in y_ref:
                    y_ref[blocks] = v
                else:
                    assert abs(v - y_ref[blocks]) <= 1e-4 * abs(
                        y_ref[blocks]), (label, v, y_ref[blocks])

                best = float("inf")
                for t in range(3):
                    t0 = time.monotonic()
                    float(fused(jnp.float32(1e-6 * t), x, hr, hi))
                    best = min(best, time.monotonic() - t0)
                out = channels * blocks * cfg.block_size * args.k_chain
                print(json.dumps({
                    "exp": "live_step_rate", "variant": label,
                    "blocks": blocks, "inv_q2": q2, "form": form,
                    "step_ms": round(best / args.k_chain * 1e3, 3),
                    "g_samples_per_s": round(out / best / 1e9, 3),
                }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
