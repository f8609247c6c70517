"""Internal-geometry sweep: throughput vs fft_size per upsample ratio.

The sidecar geometry (fft 131072, block 51072) spends 61% of every frame
recomputing the 80000-sample overlap. Overlap-save output is independent of
the blocking, so the runtime is free to pick a larger internal fft_size
(block = fft - (taps-1)) to amortize the overlap — this sweep measures what
that buys per ratio on the real chip.

Methodology: chained iterations inside one jit (lazy-execution-safe, same
as bench.py); equal *output* samples per timed region across geometries.

Usage: python benchmarks/bench_geometry.py [--ratios 2,4,8,16]
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
            k_chain: int = 8) -> float:
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
    blocks = max(1, round(out_target / (channels * block)))
    n = np.arange(taps) - (taps - 1) / 2
    h = np.sinc(n / ratio) * np.kaiser(taps, 25.0)
    h *= ratio * 0.99 / h.sum()
    hr, hi = filter_spectrum(h, fft_size)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.normal(size=(channels, cfg.halo_in + blocks * cfg.block_in))
         * 0.3).astype(np.float32)))

    def body(acc, _):
        y = upsample_blocks(x * (1.0 + 1e-6 * acc), (hr, hi), cfg)
        return acc + jnp.sum(jnp.abs(y)), None

    fused = jax.jit(
        lambda a0: jax.lax.scan(body, a0, None, length=k_chain)[0])
    v = float(fused(jnp.float32(0)))  # compile + first run
    assert np.isfinite(v) and v > 0
    best = float("inf")
    for t in range(3):
        t0 = time.monotonic()
        v = float(fused(jnp.float32(1e-6 * t)))
        best = min(best, time.monotonic() - t0)
    assert np.isfinite(v)
    out_samples = channels * blocks * block * k_chain
    return out_samples / best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratios", default="2,4,8,16")
    ap.add_argument("--ffts", default="131072,262144,524288")
    args = ap.parse_args()
    ratios = [int(r) for r in args.ratios.split(",")]
    ffts = [int(f) for f in args.ffts.split(",")]

    print(f"{'ratio':>5} {'fft':>8} {'block':>8} {'M samples/s':>12}")
    for ratio in ratios:
        for fft in ffts:
            block = fft - 80000
            if block % ratio or (fft // ratio) % 2:
                continue
            try:
                sps = measure(ratio, fft)
            except Exception as e:  # noqa: BLE001
                print(f"{ratio:>5} {fft:>8} {block:>8}  FAILED: {e}",
                      file=sys.stderr)
                continue
            print(f"{ratio:>5} {fft:>8} {block:>8} {sps/1e6:>12.0f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
