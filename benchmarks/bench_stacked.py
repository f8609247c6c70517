"""Measure the stacked complex-matmul formulation vs the 4-real-matmul one.

A complex matmul (A_r + iA_i)(W_r + iW_i) is currently 4 real matmuls of
contraction K. Stacking operands as [A_r A_i] @ [[W_r, W_i], [-W_i, W_r]]
computes the identical products in ONE matmul of contraction 2K — same
FLOPs, same arithmetic (sums move into the MXU accumulator), but the
measured MXU rate on this backend grows with K well past 256
(bench_stages k_sweep), and one call replaces four.

Also extends the K-rate sweep to 512..2048 at pipeline-scale M to locate
where the rate saturates.

  python -m benchmarks.bench_stacked [--frames 512]
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
    """step_y(scale, *ops) -> y; big operands passed as jit args (closure
    constants above ~100 MB overflow the remote-compile request)."""
    import jax
    import jax.numpy as jnp

    def fused(a0, *ops):
        def body(acc, _):
            y = step_y(1.0 + 1e-6 * acc, *ops)
            return acc + jnp.sum(jnp.abs(y)), None

        return jax.lax.scan(body, a0, None, length=K_CHAIN)[0]

    return jax.jit(fused)


def bench_k_sweep_ext(m: int) -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for k, n in ((512, 256), (1024, 256), (2048, 256), (512, 200),
                 (256, 100)):
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
        fused = _chain(lambda s, a, w: jnp.dot(
            a * s, w, precision=jax.lax.Precision.HIGHEST))
        best = _timeit(fused, a, w)
        print(json.dumps({
            "exp": "k_sweep_ext", "m": m, "k": k, "n": n,
            "tflop_s": round(2.0 * m * k * n * K_CHAIN / best / 1e12, 2),
        }), flush=True)


def bench_stacked_vs_split(frames: int) -> None:
    """Production stage-2 shape: [B*256, 256] complex @ [256, 100] complex."""
    import jax
    import jax.numpy as jnp

    pr = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    B, p2, q2, cols = frames, 256, 256, 100
    cr = (rng.normal(size=(B, p2, q2)) * 0.1).astype(np.float32)
    ci = (rng.normal(size=(B, p2, q2)) * 0.1).astype(np.float32)
    wr = (rng.normal(size=(q2, cols)) * 0.1).astype(np.float32)
    wi = (rng.normal(size=(q2, cols)) * 0.1).astype(np.float32)

    flops4 = 4 * 2 * B * p2 * q2 * cols * K_CHAIN

    # Split: 4 real matmuls + adds (the current _cmatmul form).
    def split(s, cr, ci, wr, wi):
        dr = (jnp.einsum("bkq,qm->bmk", cr * s, wr, precision=pr)
              - jnp.einsum("bkq,qm->bmk", ci, wi, precision=pr))
        di = (jnp.einsum("bkq,qm->bmk", cr * s, wi, precision=pr)
              + jnp.einsum("bkq,qm->bmk", ci, wr, precision=pr))
        return dr + di

    ops = tuple(map(jnp.asarray, (cr, ci, wr, wi)))
    best = _timeit(_chain(split), *ops)
    print(json.dumps({"exp": "cmatmul", "form": "split4",
                      "us_per_frame": round(best / (K_CHAIN * B) * 1e6, 2),
                      "tflop_s": round(flops4 / best / 1e12, 2)}), flush=True)

    # Stacked: one [.., 2q] @ [2q, 2cols] block matmul.
    z = np.concatenate([cr, ci], axis=-1)  # [B, p2, 2*q2]
    wblk = np.block([[wr, wi], [-wi, wr]])  # [2*q2, 2*cols]

    def stacked(s, z, wblk):
        d = jnp.einsum("bkq,qm->bmk", z * s, wblk, precision=pr)
        return d[:, :cols] + d[:, cols:]

    best = _timeit(_chain(stacked), jnp.asarray(z), jnp.asarray(wblk))
    print(json.dumps({"exp": "cmatmul", "form": "stacked_2K",
                      "us_per_frame": round(best / (K_CHAIN * B) * 1e6, 2),
                      "tflop_s": round(flops4 / best / 1e12, 2)}), flush=True)

    # Numerical agreement (not just speed).
    a = jnp.asarray(z)
    d = np.asarray(jax.jit(lambda z, w: jnp.einsum(
        "bkq,qm->bmk", z, w, precision=pr))(a[:2], jnp.asarray(wblk)))
    ref_r = cr[:2].astype(np.float64) @ wr.astype(np.float64) \
        - ci[:2].astype(np.float64) @ wi.astype(np.float64)
    got_r = np.swapaxes(d[:, :cols], 1, 2)
    err = np.abs(got_r - ref_r).max() / np.abs(ref_r).max()
    print(json.dumps({"exp": "cmatmul", "form": "stacked_relerr",
                      "max_rel_err": float(err)}), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--only", default="ksweep,stacked")
    args = p.parse_args(argv)
    import jax

    print(f"platform: {jax.devices()[0]}", file=sys.stderr)
    parts = set(args.only.split(","))
    if "ksweep" in parts:
        bench_k_sweep_ext(args.frames * 256)
    if "stacked" in parts:
        bench_stacked_vs_split(args.frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
