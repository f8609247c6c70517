"""Headline benchmark: upsampled output samples/s/chip at 16x / 80k taps.

Runs the production overlap-save geometry (taps 80001, fft 131072, block
51072, ratio 16 — the bundled-filter config of the reference) on stereo
audio, device-resident, steady-state.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md);
its implied requirement is sustaining realtime 16x stereo output
(2 ch x 705600 samples/s) on a Raspberry Pi GPU. vs_baseline is therefore
the realtime multiple: value / (2 * 705600).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from totton_tpu.ops.overlap_save import (
        OverlapSaveConfig,
        filter_spectrum,
        upsample_blocks,
    )

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    cfg = OverlapSaveConfig(taps=80001, fft_size=131072, block_size=51072,
                            ratio=16)
    # Windowed-sinc taps (same geometry/DC contract as the designed filters;
    # tap values don't affect throughput).
    n = np.arange(cfg.taps) - (cfg.taps - 1) / 2
    h = np.sinc(n / 16) * np.kaiser(cfg.taps, 25.0)
    h *= 16 * 0.99 / h.sum()
    hr, hi = filter_spectrum(h, cfg.fft_size)

    channels = 2
    blocks = 64
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(
            (rng.normal(size=(channels, cfg.halo_in + blocks * cfg.block_in))
             * 0.3).astype(np.float32)
        )
    )

    fn = jax.jit(lambda x, hr, hi: upsample_blocks(x, (hr, hi), cfg))

    t0 = time.monotonic()
    y = fn(x, hr, hi)
    y.block_until_ready()
    compile_s = time.monotonic() - t0
    # Numerical sanity: output must be finite and nonzero (guards against
    # silently-deferred execution).
    probe = np.asarray(y[:, :1024])
    assert np.all(np.isfinite(probe)) and np.abs(probe).max() > 0, "bad output"
    print(f"first call (compile + run): {compile_s:.1f}s, out {y.shape}",
          file=sys.stderr)

    # Warmup then timed steady-state iterations.
    for _ in range(3):
        fn(x, hr, hi).block_until_ready()
    iters = 20
    t0 = time.monotonic()
    for _ in range(iters):
        y = fn(x, hr, hi)
    y.block_until_ready()
    elapsed = time.monotonic() - t0

    out_samples = channels * blocks * cfg.block_size * iters
    samples_per_s = out_samples / elapsed
    realtime_multiple = samples_per_s / (channels * 705600.0)
    print(
        f"{iters} iters in {elapsed:.3f}s -> {samples_per_s/1e6:.1f} M output "
        f"samples/s ({realtime_multiple:.0f}x realtime 16x stereo)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "upsampled_output_samples_per_s_per_chip_16x_80ktap_stereo",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(realtime_multiple, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
