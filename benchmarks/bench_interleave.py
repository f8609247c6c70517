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
stereo) with bench.py's chained-honest-timing harness, both modes in one
session, and prints one JSON line per mode. The winner becomes the default
of ops.overlap_save._STAGE2_INTERLEAVE (recorded in PERF.md round 3).

  python -m benchmarks.bench_interleave [--blocks 1024] [--k-chain 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import totton_tpu  # noqa: F401  (applies TOTTON_PLATFORM before JAX init)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--k-chain", type=int, default=10)
    ap.add_argument("--modes", default="stack,einsum,stacked",
                    help="comma list of formulations to measure")
    ap.add_argument("--inv-q2", default="",
                    help="comma list of inverse Q2 splits to A/B per mode "
                         "(0 = balanced default; see overlap_save._INV_Q2)")
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
    x = jax.device_put(jnp.asarray(
        (rng.normal(size=(channels,
                          cfg.halo_in + args.blocks * cfg.block_in))
         * 0.3).astype(np.float32)))

    results = {}
    y_ref = None
    inv_q2s = [int(v) for v in args.inv_q2.split(",") if v != ""] or [None]
    # "stack"/"einsum": stage-2 interleave formulations (split inverse);
    # "stacked": whole-inverse real/imag-stacked form (2 einsums total).
    # Each mode is crossed with every requested inverse Q2 rebalance.
    for mode, inv_q2 in ((m, q) for m in args.modes.split(",")
                         for q in inv_q2s):
        # Knobs are read at trace time; a fresh jit per mode traces a
        # fresh program. (Env vars TOTTON_STAGE2_INTERLEAVE /
        # TOTTON_ABSORBED_FORM / TOTTON_INV_Q2 are the production knobs;
        # this in-session mutation is bench-only.)
        stacked = mode in ("stacked", "stacked2")
        osv._ABSORBED_FORM = mode if stacked else "split"
        osv._STAGE2_INTERLEAVE = "einsum" if stacked else mode
        if inv_q2 is not None:
            osv._INV_Q2 = inv_q2
            mode = f"{mode}@q2={inv_q2 or 'def'}"

        def chain(a0, xa, r, i):
            def body(acc, _):
                y = osv.upsample_blocks(xa * (1.0 + 1e-6 * acc), (r, i),
                                        cfg)
                return acc + jnp.sum(jnp.abs(y)), None

            return jax.lax.scan(body, a0, None, length=args.k_chain)[0]

        fused = jax.jit(chain)
        t0 = time.monotonic()
        v = float(fused(jnp.float32(0), x, hr, hi))
        print(f"[{mode}] first call: {time.monotonic() - t0:.1f}s",
              file=sys.stderr)
        assert np.isfinite(v) and v > 0
        # Cross-mode equivalence on the measured program (same chained
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
        results[mode] = sps
        print(json.dumps({
            "exp": "stage2_interleave", "mode": mode,
            "blocks": args.blocks, "k_chain": args.k_chain,
            "best_s": round(best, 4),
            "g_samples_per_s": round(sps / 1e9, 3),
        }))

    for num, den in (("einsum", "stack"), ("stacked", "einsum")):
        if num in results and den in results:
            print(json.dumps({
                "exp": "stage2_interleave", "mode": f"{num}/{den}",
                "speedup": round(results[num] / results[den], 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
