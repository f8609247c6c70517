"""Calibrate MXU precision modes on the real chip.

Round-1 microbenchmarks (PERF.md) measured f32 matmul at 14.3 TFLOP/s with
Precision.HIGHEST but 23.2 TFLOP/s with DEFAULT — a latent 1.6x matmul-floor
drop for the whole pipeline IF DEFAULT is accurate enough (the signal path
targets >130 dB SNR to preserve the 140 dB stopband story; HIGH measured
89.8 dB end-to-end in round 1 and was rejected).

Three experiments, all chained-dependency timed (this backend executes
lazily; see bench.py):

1. snr: single [n, n] matmul per precision vs numpy float64 — what does
   each mode actually deliver, numerically?
2. tput: [4096, K] @ [K, 4096] throughput per precision per contraction
   size K — validates the "flat per-stage time for K <= 128" MXU model
   that sets the pipeline's matmul floor (PERF.md round 2).
3. pipeline: the production 16x/80k-tap overlap-save pipeline with
   ops.fft._PRECISION overridden per mode — end-to-end SNR vs a float64
   scipy oracle, and throughput at the shipped dispatch depth.

  python -m benchmarks.bench_precision [--only snr,tput,pipeline] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import totton_tpu  # noqa: F401  (applies TOTTON_PLATFORM before JAX init)

K_CHAIN = 8


def _snr_db(y, ref) -> float:
    noise = np.asarray(y, np.float64) - ref
    return float(
        10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-300))
    )


def _modes():
    import jax

    return [
        ("DEFAULT", jax.lax.Precision.DEFAULT),
        ("HIGH", jax.lax.Precision.HIGH),
        ("HIGHEST", jax.lax.Precision.HIGHEST),
    ]


def bench_snr(quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    n = 1024 if quick else 2048
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, n)).astype(np.float32)
    b = rng.normal(size=(n, n)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)
    for name, prec in _modes():
        f = jax.jit(lambda x, y, p=prec: jnp.dot(x, y, precision=p))
        c = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
        print(json.dumps({
            "exp": "matmul_snr", "precision": name, "n": n,
            "snr_db": round(_snr_db(c, ref), 1),
        }), flush=True)


def bench_tput(quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    m = n = 2048 if quick else 4096
    ks = [32, 128] if quick else [32, 64, 128, 256, 2048]
    rng = np.random.default_rng(0)
    for name, prec in _modes():
        if name == "HIGH":
            continue  # round 1 pinned HIGH; DEFAULT vs HIGHEST is the call
        for k in ks:
            a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))

            def body(acc, _, a=a, w=w, prec=prec):
                y = jnp.dot(a * (1.0 + 1e-6 * acc), w, precision=prec)
                return acc + jnp.sum(jnp.abs(y)), None

            fused = jax.jit(lambda a0, body=body: jax.lax.scan(
                body, a0, None, length=K_CHAIN)[0])
            v = float(fused(jnp.float32(0)))
            assert np.isfinite(v) and v != 0
            best = float("inf")
            for t in range(3):
                t0 = time.monotonic()
                float(fused(jnp.float32(1e-6 * t)))
                best = min(best, time.monotonic() - t0)
            tflops = 2.0 * m * k * n * K_CHAIN / best / 1e12
            print(json.dumps({
                "exp": "matmul_tput", "precision": name, "m": m, "k": k,
                "n": n, "tflop_s": round(tflops, 2),
            }), flush=True)


def _pipeline_once(prec, quick: bool) -> dict:
    """SNR + throughput of the 16x pipeline with ops.fft._PRECISION=prec."""
    import jax
    import jax.numpy as jnp

    from totton_tpu.ops import fft as _fft
    from totton_tpu.ops.overlap_save import (
        OverlapSaveConfig, filter_spectrum, upsample_blocks,
    )

    saved = _fft._PRECISION
    _fft._PRECISION = prec
    try:
        taps_n, fft = (8001, 16384) if quick else (80001, 131072)
        cfg = OverlapSaveConfig(taps=taps_n, fft_size=fft,
                                block_size=fft - (taps_n - 1), ratio=16)
        nn = np.arange(cfg.taps) - (cfg.taps - 1) / 2
        h = np.sinc(nn / 16) * np.kaiser(cfg.taps, 25.0)
        h *= 16 * 0.99 / h.sum()
        spec = filter_spectrum(h, cfg.fft_size)
        rng = np.random.default_rng(0)

        # SNR: 32 blocks (covers the absorbed >=32-frame path), 1 channel.
        snr_blocks = 32
        xs = (rng.normal(size=(1, cfg.halo_in + snr_blocks * cfg.block_in))
              * 0.3).astype(np.float32)
        y = np.asarray(jax.jit(
            lambda a: upsample_blocks(a, spec, cfg))(jnp.asarray(xs)))[0]
        from scipy import signal as ssig
        up = np.zeros((xs.shape[1]) * 16)
        up[::16] = xs[0]
        ref_full = ssig.fftconvolve(up, h.astype(np.float64))[: len(up)]
        ref = ref_full[cfg.halo_in * 16:]
        snr = _snr_db(y, ref[: len(y)])

        # Throughput: stereo at a deep dispatch.
        blocks = 64 if quick else 512
        x = jnp.asarray(
            (rng.normal(size=(2, cfg.halo_in + blocks * cfg.block_in)) * 0.3)
            .astype(np.float32))

        # Operands as jit arguments (closure arrays bloat the serialized
        # executable — PERF.md "First-call latency anatomy").
        def chain(a0, xa, sp):
            def body(acc, _):
                yy = upsample_blocks(xa * (1.0 + 1e-6 * acc), sp, cfg)
                return acc + jnp.sum(jnp.abs(yy)), None

            return jax.lax.scan(body, a0, None, length=K_CHAIN)[0]

        fused = jax.jit(chain)
        v = float(fused(jnp.float32(0), x, spec))
        assert np.isfinite(v) and v != 0
        best = float("inf")
        for t in range(3):
            t0 = time.monotonic()
            float(fused(jnp.float32(1e-6 * t), x, spec))
            best = min(best, time.monotonic() - t0)
        sps = 2 * blocks * cfg.block_size * K_CHAIN / best
        return {"snr_db": round(snr, 1), "samples_per_s": round(sps, 1)}
    finally:
        _fft._PRECISION = saved


def bench_pipeline(quick: bool) -> None:
    for name, prec in _modes():
        if name == "HIGH":
            continue  # measured in round 1: 89.8 dB, +9% — rejected
        r = _pipeline_once(prec, quick)
        r.update({"exp": "pipeline_16x", "precision": name})
        print(json.dumps(r), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--only", default="snr,tput,pipeline")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)
    import jax

    print(f"platform: {jax.devices()[0]}", file=sys.stderr)
    parts = set(args.only.split(","))
    if "snr" in parts:
        bench_snr(args.quick)
    if "tput" in parts:
        bench_tput(args.quick)
    if "pipeline" in parts:
        bench_pipeline(args.quick)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
