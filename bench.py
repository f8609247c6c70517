"""Headline benchmark: upsampled output samples/s/chip at 16x / 80k taps.

Runs the production overlap-save geometry (taps 80001, fft 131072, block
51072, ratio 16 — the bundled-filter config of the reference) on stereo
audio, device-resident.

Measurement methodology (important on this backend): execution is lazy —
block_until_ready does NOT force unconsumed results, so naive timing loops
measure nothing. The timed region is K chained iterations inside one jit
(each iteration's input depends on the previous iteration's full output via
a scalar reduction), closed by a host read of the final scalar. This forces
K real, serialized evaluations of the full pipeline.

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

import totton_tpu  # noqa: F401  (applies TOTTON_PLATFORM before JAX init)


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
    # Dispatch depth: throughput climbs with batch (PERF.md sweep: 2.5 G at
    # 128 blocks -> 4.2 G at 1024, same session); 1024 blocks ~ 26 MB input,
    # ~2.5 GB peak working set — comfortably device-resident.
    blocks = 1024
    k_chain = 10
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(
            (rng.normal(size=(channels, cfg.halo_in + blocks * cfg.block_in))
             * 0.3).astype(np.float32)
        )
    )

    def chain(a0, xa, r, i):
        def body(acc, _):
            # The input perturbation makes iteration i+1 depend on the FULL
            # output of iteration i; the reduction consumes every sample.
            y = upsample_blocks(xa * (1.0 + 1e-6 * acc), (r, i), cfg)
            return acc + jnp.sum(jnp.abs(y)), None

        return jax.lax.scan(body, a0, None, length=k_chain)[0]

    # x/hr/hi enter as ARGUMENTS, not closure constants: closed-over arrays
    # are baked into the serialized executable, and on this tunneled backend
    # first-call latency is dominated by shipping that executable to the
    # remote runtime (measured: 146 MB with baked constants -> ~5-8 min
    # first call even on a persistent-cache hit).
    fused = jax.jit(chain)

    t0 = time.monotonic()
    v = float(fused(jnp.float32(0), x, hr, hi))
    compile_s = time.monotonic() - t0
    assert np.isfinite(v) and v > 0, "bad output"
    print(f"first call (compile + run): {compile_s:.1f}s", file=sys.stderr)

    # Steady state: best of 3 (each timed region = k_chain real pipeline
    # evaluations, closed by the host read of the final scalar).
    best = float("inf")
    for trial in range(3):
        t0 = time.monotonic()
        v = float(fused(jnp.float32(1e-6 * trial), x, hr, hi))
        best = min(best, time.monotonic() - t0)
    assert np.isfinite(v) and v > 0

    out_samples = channels * blocks * cfg.block_size * k_chain
    samples_per_s = out_samples / best
    realtime_multiple = samples_per_s / (channels * 705600.0)
    print(
        f"best of 3: {k_chain} chained iters in {best:.3f}s -> "
        f"{samples_per_s/1e6:.1f} M output samples/s "
        f"({realtime_multiple:.0f}x realtime 16x stereo)",
        file=sys.stderr,
    )

    # Secondary: single-dispatch latency (includes host->device round trip).
    single = jax.jit(
        lambda a, r, i: jnp.sum(jnp.abs(upsample_blocks(a, (r, i), cfg)))
    )
    float(single(x, hr, hi))
    t0 = time.monotonic()
    float(single(x, hr, hi))
    print(f"single-dispatch latency ({blocks} blocks): "
          f"{(time.monotonic() - t0) * 1e3:.1f} ms", file=sys.stderr)

    # SNR regression on the measured kernel path (guards against numerics
    # rot between rounds: the throughput number is only meaningful if the
    # >130 dB signal path holds; 32 blocks covers the absorbed >=32-frame
    # production path).
    from scipy import signal as ssig

    snr_blocks = 32
    xs = (rng.normal(size=(1, cfg.halo_in + snr_blocks * cfg.block_in))
          * 0.3).astype(np.float32)
    y = np.asarray(jax.jit(
        lambda a, r, i: upsample_blocks(a, (r, i), cfg)
    )(jnp.asarray(xs), hr, hi))[0]
    up = np.zeros(xs.shape[1] * 16)
    up[::16] = xs[0]
    ref = ssig.fftconvolve(up, h.astype(np.float64))[: len(up)]
    ref = ref[cfg.halo_in * 16:][: len(y)]
    noise = y.astype(np.float64) - ref
    snr_db = 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-300))
    print(f"on-chip SNR vs float64 oracle: {snr_db:.1f} dB", file=sys.stderr)
    # TPU HIGHEST measures 135-136 dB; the CPU backend's f32 accumulation
    # lands ~128 dB. 125 catches any precision-mode regression (HIGH is
    # 90 dB, DEFAULT 47 dB) on either backend.
    assert snr_db > 125.0, f"kernel SNR regression: {snr_db:.1f} dB"

    import jaxlib

    print(json.dumps({
        "metric": "upsampled_output_samples_per_s_per_chip_16x_80ktap_stereo",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(realtime_multiple, 2),
        "snr_db_vs_float64": round(float(snr_db), 1),
        # Environment pin: perf claims are only comparable within one
        # jax/jaxlib (XLA) version (requirements-lock.txt).
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
    }))
    return 0


def _main_with_retry() -> int:
    """The tunneled backend occasionally drops a run mid-flight
    (FAILED_PRECONDITION / hung dispatch — PERF.md environment-volatility
    caveat). A transient failure must not cost the recorded benchmark, and
    in-process backend state is unreliable after one, so retry by
    re-exec'ing a fresh interpreter (max 2 retries)."""
    import os

    attempt = int(os.environ.get("TOTTON_BENCH_ATTEMPT", "0"))
    try:
        return main()
    except Exception as e:
        if attempt >= 2:
            raise
        print(f"bench attempt {attempt + 1} failed ({type(e).__name__}: "
              f"{e}); retrying in 30s", file=sys.stderr)
        time.sleep(30)
        os.environ["TOTTON_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    raise SystemExit(_main_with_retry())
