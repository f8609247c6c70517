"""Hardware A/B: stacked vs interleave-absorbed stage-2 of the 16x path.

The absorbed inverse's last full-array pass is the even/odd output
interleave (round-2 PERF.md named it as the one unexhausted HBM lever at
16x: one extra read+write of the full output per frame). Two formulations:

- "stack": stage-2 emits Re and Im as two separate matmuls; an explicit
  jnp.stack(..., axis=-1) + reshape interleaves them (the round-2 default).
- "einsum": the interleave is absorbed into the stage-2 weights
  (ops.overlap_save._stage2_matrix_interleaved): the einsum output carries
  an explicit even/odd axis and the natural interleaved order is a pure
  reshape of the matmul output — the stack pass never exists. Costs 2x the
  stage-2 weight bytes (A and B both [q2, p2', 2]) for zero extra FLOPs.

Runs the headline geometry (80001 taps / fft 131072 / block 51072 / 16x,
stereo) with bench.py's chained-honest-timing harness, all requested
formulations in one session, and prints one JSON line per variant.
Winners become the KernelTuning defaults (recorded in PERF.md).

  python -m benchmarks.bench_interleave [--blocks 1024] [--k-chain 10]
      [--modes stack,einsum,stacked,stacked2] [--inv-q2 0,128,256]
      [--fwd-p 0,64,128] [--ratio 16]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

import numpy as np

import totton_tpu  # noqa: F401  (applies TOTTON_PLATFORM before JAX init)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--k-chain", type=int, default=10)
    ap.add_argument("--ratio", type=int, default=16)
    ap.add_argument("--modes", default="stack,einsum,stacked",
                    help="comma list of formulations to measure")
    ap.add_argument("--inv-q2", default="",
                    help="comma list of inverse Q2 splits to A/B per mode "
                         "(0 = balanced default; KernelTuning.inv_q2)")
    ap.add_argument("--fwd-p", default="",
                    help="comma list of forward split P values to A/B "
                         "(0 = _factorize default; KernelTuning.fwd_p)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from totton_tpu.ops import overlap_save as osv

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    r = args.ratio
    cfg = osv.OverlapSaveConfig(taps=80001, fft_size=131072,
                                block_size=51072, ratio=r)
    n = np.arange(cfg.taps) - (cfg.taps - 1) / 2
    h = np.sinc(n / r) * np.kaiser(cfg.taps, 25.0)
    h *= r * 0.99 / h.sum()
    hr, hi = osv.filter_spectrum(h, cfg.fft_size)

    channels = 2
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.normal(size=(channels,
                          cfg.halo_in + args.blocks * cfg.block_in))
         * 0.3).astype(np.float32)))

    results: dict[tuple, float] = {}
    y_ref = None
    inv_q2s = [int(v) for v in args.inv_q2.split(",") if v != ""] or [0]
    fwd_ps = [int(v) for v in args.fwd_p.split(",") if v != ""] or [0]
    # "stack"/"einsum": stage-2 interleave formulations (split inverse);
    # "stacked"/"stacked2": whole-inverse real/imag-stacked forms.
    # Each mode is crossed with every requested inverse-Q2 rebalance and
    # forward-split P. KernelTuning instances make each variant a distinct
    # jit cache entry — no process restart, no module-global mutation.
    for mode, inv_q2, fwd_p in itertools.product(
            args.modes.split(","), inv_q2s, fwd_ps):
        stacked = mode in ("stacked", "stacked2")
        tuning = osv.KernelTuning(
            form=mode if stacked else "split",
            stage2_interleave="einsum" if stacked else mode,
            inv_q2=inv_q2, fwd_p=fwd_p)
        label = mode
        if inv_q2:
            label += f"@q2={inv_q2}"
        if fwd_p:
            label += f"@p={fwd_p}"

        def chain(a0, xa, r_, i_):
            def body(acc, _):
                y = osv.upsample_blocks(xa * (1.0 + 1e-6 * acc), (r_, i_),
                                        cfg, tuning)
                return acc + jnp.sum(jnp.abs(y)), None

            return jax.lax.scan(body, a0, None, length=args.k_chain)[0]

        fused = jax.jit(chain)
        t0 = time.monotonic()
        v = float(fused(jnp.float32(0), x, hr, hi))
        print(f"[{label}] first call: {time.monotonic() - t0:.1f}s",
              file=sys.stderr)
        assert np.isfinite(v) and v > 0
        # Cross-variant equivalence on the measured program (same chained
        # scalar: the formulations are algebraically identical).
        if y_ref is None:
            y_ref = v
        else:
            assert abs(v - y_ref) <= 1e-4 * abs(y_ref), (v, y_ref)

        best = float("inf")
        for t in range(3):
            t0 = time.monotonic()
            float(fused(jnp.float32(1e-6 * t), x, hr, hi))
            best = min(best, time.monotonic() - t0)

        out_samples = channels * args.blocks * cfg.block_size * args.k_chain
        sps = out_samples / best
        results[(mode, inv_q2, fwd_p)] = sps
        print(json.dumps({
            "exp": "stage2_interleave", "mode": label,
            "blocks": args.blocks, "k_chain": args.k_chain,
            "best_s": round(best, 4),
            "g_samples_per_s": round(sps / 1e9, 3),
        }))

    # Cross-mode speedups within each (inv_q2, fwd_p) group, so ratios
    # survive an --inv-q2/--fwd-p cross product (round-3 advisor finding).
    for q2, p in itertools.product(inv_q2s, fwd_ps):
        for num, den in (("einsum", "stack"), ("stacked", "einsum"),
                         ("stacked2", "stacked")):
            a, b = results.get((num, q2, p)), results.get((den, q2, p))
            if a and b:
                tag = f"{num}/{den}"
                if q2 or p:
                    tag += f"@q2={q2},p={p}"
                print(json.dumps({
                    "exp": "stage2_interleave", "mode": tag,
                    "speedup": round(a / b, 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
