"""Geometry/dispatch-depth sweep: throughput vs fft_size and batch size.

Two levers, measured on the real chip:
- internal fft_size (block = fft - (taps-1)): amortizes the 80000-sample
  overlap recompute. Finding: nearly flat (+-8%) — the kernel is not
  geometry-bound.
- dispatch depth (blocks per device dispatch): the dominant lever. The
  per-frame matmuls only fill the MXU (and amortize the absorbed weight
  tensor) when batched; throughput keeps climbing past 512 blocks.
  This set OFFLINE_BATCH_BLOCKS (totton_tpu/io/stream.py); see PERF.md.

Methodology: chained iterations inside one jit (lazy-execution-safe, same
as bench.py); equal *output* samples per timed region across geometries
unless --blocks pins the dispatch depth.

Usage: python benchmarks/bench_geometry.py [--ratios 2,4,8,16]
           [--ffts 131072,...] [--blocks 128,512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import totton_tpu  # noqa: F401,E402


def measure(ratio: int, fft_size: int, taps: int = 80001,
            channels: int = 2, out_target: int = 13_000_000,
            k_chain: int = 8, blocks: int | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from totton_tpu.ops.overlap_save import (
        OverlapSaveConfig,
        filter_spectrum,
        upsample_blocks,
    )

    block = fft_size - (taps - 1)
    cfg = OverlapSaveConfig(taps=taps, fft_size=fft_size, block_size=block,
                            ratio=ratio)
    if blocks is None:
        blocks = max(1, round(out_target / (channels * block)))
    n = np.arange(taps) - (taps - 1) / 2
    h = np.sinc(n / ratio) * np.kaiser(taps, 25.0)
    h *= ratio * 0.99 / h.sum()
    hr, hi = filter_spectrum(h, fft_size)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.normal(size=(channels, cfg.halo_in + blocks * cfg.block_in))
         * 0.3).astype(np.float32)))

    # Big operands enter as jit ARGUMENTS (closure arrays get baked into
    # the serialized executable; see PERF.md "First-call latency anatomy").
    def chain(a0, xa, r, i):
        def body(acc, _):
            y = upsample_blocks(xa * (1.0 + 1e-6 * acc), (r, i), cfg)
            return acc + jnp.sum(jnp.abs(y)), None

        return jax.lax.scan(body, a0, None, length=k_chain)[0]

    fused = jax.jit(chain)
    v = float(fused(jnp.float32(0), x, hr, hi))  # compile + first run
    assert np.isfinite(v) and v > 0
    best = float("inf")
    for t in range(3):
        t0 = time.monotonic()
        v = float(fused(jnp.float32(1e-6 * t), x, hr, hi))
        best = min(best, time.monotonic() - t0)
    assert np.isfinite(v)
    out_samples = channels * blocks * block * k_chain
    return out_samples / best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratios", default="2,4,8,16")
    ap.add_argument("--ffts", default="131072,262144,524288")
    ap.add_argument("--blocks", default=None,
                    help="comma list of dispatch depths (default: sized "
                         "for ~13M output samples)")
    args = ap.parse_args()
    ratios = [int(r) for r in args.ratios.split(",")]
    ffts = [int(f) for f in args.ffts.split(",")]
    depths = ([int(b) for b in args.blocks.split(",")] if args.blocks
              else [None])

    print(f"{'ratio':>5} {'fft':>8} {'block':>8} {'blocks':>7} "
          f"{'M samples/s':>12}")
    for ratio in ratios:
        for fft in ffts:
            block = fft - 80000
            if block % ratio or (fft // ratio) % 2:
                continue
            for depth in depths:
                try:
                    sps = measure(ratio, fft, blocks=depth)
                except Exception as e:  # noqa: BLE001
                    print(f"{ratio:>5} {fft:>8} {block:>8} "
                          f"{depth or 'auto':>7}  FAILED: {e}",
                          file=sys.stderr)
                    continue
                print(f"{ratio:>5} {fft:>8} {block:>8} {depth or 'auto':>7} "
                      f"{sps/1e6:>12.0f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
