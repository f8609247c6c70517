"""Per-stage time decomposition of the absorbed 16x pipeline on hardware.

Times each matmul stage of ops.overlap_save._upsample_frames_absorbed in
isolation, with the exact production shapes at a realistic dispatch depth,
plus a big-M contraction-size (K) sweep. Together these answer:

- where the measured ~12-13 us/frame of the 16x path actually goes
  (matmul stages vs elementwise/tile/interleave data movement), and
- what matmul rate each contraction size can reach at pipeline-scale M
  (the small-M sweep in bench_precision is overhead-bound).

That residual (total - sum of stages) is the honest upper bound on what a
fused Pallas kernel can recover; the K-rates set the matmul floor no kernel
can beat (PERF.md round-2 analysis).

  python -m benchmarks.bench_stages [--frames 512] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import totton_tpu  # noqa: F401

K_CHAIN = 8


def _timeit(fused, *args) -> float:
    import jax.numpy as jnp

    v = float(fused(jnp.float32(0), *args))
    assert np.isfinite(v) and v != 0
    best = float("inf")
    for t in range(3):
        t0 = time.monotonic()
        float(fused(jnp.float32(1e-6 * t), *args))
        best = min(best, time.monotonic() - t0)
    return best


def _chain(step_y):
    """step_y(scale, *ops) -> y. Operands are jit ARGUMENTS, not closures:
    closure device arrays >~100 MB are embedded in the remote-compile
    request and overflow its body limit (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    def fused(a0, *ops):
        def body(acc, _):
            y = step_y(1.0 + 1e-6 * acc, *ops)
            return acc + jnp.sum(jnp.abs(y)), None

        return jax.lax.scan(body, a0, None, length=K_CHAIN)[0]

    return jax.jit(fused)


def bench_k_sweep(frames: int) -> None:
    """Contraction-size sweep at pipeline-scale M (= frames * 256)."""
    import jax
    import jax.numpy as jnp

    m = frames * 256
    n = 256
    rng = np.random.default_rng(0)
    for k in (32, 64, 128, 256):
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
        fused = _chain(lambda s, a, w: jnp.dot(
            a * s, w, precision=jax.lax.Precision.HIGHEST))
        best = _timeit(fused, a, w)
        tflops = 2.0 * m * k * n * K_CHAIN / best / 1e12
        print(json.dumps({
            "exp": "k_sweep_bigM", "m": m, "k": k, "n": n,
            "tflop_s": round(tflops, 2),
        }), flush=True)


def bench_stages(frames: int, quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    from totton_tpu.ops import fft as _fft
    from totton_tpu.ops.overlap_save import (
        OverlapSaveConfig, _absorbed_consts, _inv_split, _stage2_matrix,
        filter_spectrum, upsample_blocks, upsample_frames,
    )

    taps_n, fft = (8001, 16384) if quick else (80001, 131072)
    cfg = OverlapSaveConfig(taps=taps_n, fft_size=fft,
                            block_size=fft - (taps_n - 1), ratio=16)
    m, h = cfg.frame_in, cfg.fft_size // 2
    p2, q2, r_m, t_reps, _, _ = _absorbed_consts(m, h, _inv_split(m, h)[1])
    j0 = cfg.overlap // 2
    k2_0 = j0 // p2
    cols = q2 - k2_0
    rng = np.random.default_rng(0)
    B = frames

    results = {}

    def report(name, best, flops_per_frame, out_bytes_per_frame):
        us = best / (K_CHAIN * B) * 1e6
        results[name] = us
        print(json.dumps({
            "exp": "stage", "stage": name, "us_per_frame": round(us, 2),
            "eff_tflop_s": round(flops_per_frame * B * K_CHAIN / best / 1e12, 2),
            "out_mb_per_frame": round(out_bytes_per_frame / 1e6, 3),
        }), flush=True)

    # S0: forward split FFT of the real frames.
    x = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32) * 0.3)
    fused = _chain(lambda s, x: jnp.concatenate(
        _fft.fft2_real_split(x * s, m)[:2], axis=-1))
    mf = _fft._factorize(m)
    fwd_flops = (2 + 4) * 2 * m * max(mf)  # 2 real + 4 complex matmuls
    report("fwd_split_fft", _timeit(fused, x), fwd_flops, 2 * m * 4)

    # S1: absorbed stage-1 einsum (the split-layout contraction over s=r_m).
    p_f = mf[0]
    w = q2 // p_f
    xn = jnp.asarray(rng.normal(size=(B, p_f, r_m, w)).astype(np.float32) * 0.1)
    xni = jnp.asarray(rng.normal(size=(B, p_f, r_m, w)).astype(np.float32) * 0.1)
    gws = jnp.asarray(rng.normal(size=(p2, r_m, w, p_f)).astype(np.float32) * 0.1)
    gwsi = jnp.asarray(rng.normal(size=(p2, r_m, w, p_f)).astype(np.float32) * 0.1)

    def s1(s, xn, xni, gws, gwsi):
        pr = _fft._PRECISION
        cr = (jnp.einsum("bfsw,kswf->bkwf", xn * s, gws, precision=pr)
              - jnp.einsum("bfsw,kswf->bkwf", xni * s, gwsi, precision=pr))
        ci = (jnp.einsum("bfsw,kswf->bkwf", xn * s, gwsi, precision=pr)
              + jnp.einsum("bfsw,kswf->bkwf", xni * s, gws, precision=pr))
        return cr + ci

    s1_flops = 4 * 2 * p2 * q2 * r_m
    report("absorbed_stage1", _timeit(_chain(s1), xn, xni, gws, gwsi),
           s1_flops, 2 * p2 * q2 * 4)

    # S2: pruned stage-2 matmuls.
    cr = jnp.asarray(rng.normal(size=(B, p2, q2)).astype(np.float32) * 0.1)
    ci = jnp.asarray(rng.normal(size=(B, p2, q2)).astype(np.float32) * 0.1)
    w2r, w2i = _stage2_matrix(q2, p2, k2_0)

    def s2(s, cr, ci):
        pr = _fft._PRECISION
        dr = (jnp.einsum("bkq,qm->bmk", cr * s, w2r, precision=pr)
              - jnp.einsum("bkq,qm->bmk", ci * s, w2i, precision=pr))
        di = (jnp.einsum("bkq,qm->bmk", cr * s, w2i, precision=pr)
              + jnp.einsum("bkq,qm->bmk", ci * s, w2r, precision=pr))
        return dr + di

    s2_flops = 4 * 2 * p2 * q2 * cols
    report("pruned_stage2", _timeit(_chain(s2), cr, ci), s2_flops,
           2 * p2 * cols * 4)

    # S3: the even/odd interleave (stack + reshape) on stage-2-sized outputs.
    tr = jnp.asarray(rng.normal(size=(B, cols * p2)).astype(np.float32) * 0.1)
    ti = jnp.asarray(rng.normal(size=(B, cols * p2)).astype(np.float32) * 0.1)

    def s3(s, tr, ti):
        out = jnp.stack([tr * s, ti], axis=-1).reshape(B, -1)
        return out[..., : cfg.block_size]

    report("interleave", _timeit(_chain(s3), tr, ti), 0, 2 * cols * p2 * 4)

    # Full pipelines for the residual.
    nn = np.arange(cfg.taps) - (cfg.taps - 1) / 2
    hh = np.sinc(nn / 16) * np.kaiser(cfg.taps, 25.0)
    hh *= 16 * 0.99 / hh.sum()
    spec = filter_spectrum(hh, cfg.fft_size)

    frames_arr = jnp.asarray(
        rng.normal(size=(B, cfg.frame_in)).astype(np.float32) * 0.3)
    fused = _chain(
        lambda s, fa: upsample_frames(fa * s, spec, cfg))
    best = _timeit(fused, frames_arr)
    report("FULL_upsample_frames", best, 0, 0)

    x2 = jnp.asarray(
        (rng.normal(size=(2, cfg.halo_in + (B // 2) * cfg.block_in)) * 0.3)
        .astype(np.float32))
    fused = _chain(lambda s, x2: upsample_blocks(x2 * s, spec, cfg))
    best = _timeit(fused, x2)
    sps = 2 * (B // 2) * cfg.block_size * K_CHAIN / best
    us = best / (K_CHAIN * B) * 1e6
    print(json.dumps({
        "exp": "stage", "stage": "FULL_upsample_blocks",
        "us_per_frame": round(us, 2), "samples_per_s": round(sps, 1),
    }), flush=True)

    known = sum(v for k, v in results.items()
                if k not in ("FULL_upsample_frames",))
    print(json.dumps({
        "exp": "summary",
        "sum_stages_us": round(known, 2),
        "full_frames_us": round(results["FULL_upsample_frames"], 2),
        "residual_us": round(results["FULL_upsample_frames"] - known, 2),
    }), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only", default="stages,ksweep")
    args = p.parse_args(argv)
    import jax

    print(f"platform: {jax.devices()[0]}", file=sys.stderr)
    parts = set(args.only.split(","))
    if "ksweep" in parts:
        bench_k_sweep(64 if args.quick else args.frames)
    if "stages" in parts:
        bench_stages(64 if args.quick else args.frames, args.quick)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
