"""Fused Pallas kernel for overlap-save upsampling.

The XLA-composed pipeline (ops/overlap_save.py) is data-movement bound:
every FFT stage round-trips its [*, 65536]-pair intermediates through HBM
(~3 MB per frame; PERF.md). This kernel runs one frame's ENTIRE pipeline in
VMEM, touching HBM only for the frame in (32 KB at 16x), the block out
(204 KB), and VMEM-resident constants (DFT/twiddle matrices + the folded
spectrum; constant index maps keep them loaded across grid steps).

The in-kernel formulation is shaped by what this backend's Mosaic compiler
supports (probed empirically): 2D values only (any 3D reshape/transpose
crashes the remote compiler), no `rev`, no strided stores. Hence:

1. **Two-stage radix-<=512 FFT, strictly 2D.** n = f1*f2:
   reshape [f1, f2] -> W1^T matmul -> 2D twiddle multiply -> 2D transpose
   -> W2^T matmul -> [k2, k1] whose row-major flattening is natural order.
   (The classic 3+-stage nesting needs 3D batch reordering; radix 256
   covers fft_size up to 524288 in two stages at ~2x the FLOPs of radix
   128 — irrelevant, the kernel is bandwidth-bound.)
2. **No real-FFT untangling reversals.** The forward transform computes
   the FULL m-point DFT of the real frame (first stage needs only 2
   matmuls). Its periodic tiling E[k] = Xf[k mod m] is the zero-stuffed
   spectrum. For the half-size inverse real FFT, the untangled input is
   Z[k] = conj(A_k) X[k] + conj(B_k) conj(X[h-k]) with X = E*H; by
   Hermitian symmetry of the real-input DFT, E[h-k] = conj(E[k]) (m | h),
   so the reversals fold into precomputed filter-side arrays:
       Z = E * G1 + E2 * G2,
       G1 = conj(A) H[:h],  G2 = conj(B) conj(H[h:0:-1]),
   with E2 = E for ratio >= 2 and E2 = Xf[h:] for ratio 1.
3. **Even/odd outputs are separate** (out[2j] = Re z[j], out[2j+1] =
   Im z[j] needs a strided store): the kernel emits the real and imag
   halves as two outputs and XLA interleaves outside (one cheap pass).

G1/G2 are traced operands, so filter/EQ hot-swap never recompiles. DFT and
twiddle constants are kernel operands (Pallas kernels cannot capture array
constants).

Grid: one program per (channel x block) frame; frames arrive pre-framed
[N, frame_in].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from totton_tpu.ops.overlap_save import OverlapSaveConfig

#: Largest DFT-matmul radix (two stages cover n <= 262144).
_MAX_RADIX = 512


def _split2(n: int) -> tuple[int, int]:
    """Balanced two-factor split f1*f2 = n with f1 >= f2, both <= 512."""
    if n == 0 or n & (n - 1):
        raise ValueError(f"power-of-two size required, got {n}")
    log = n.bit_length() - 1
    f1 = 1 << ((log + 1) // 2)
    f2 = n // f1
    if f1 > _MAX_RADIX:
        raise ValueError(f"size {n} too large for two radix-512 stages")
    return f1, f2


def _dft_wt(n: int, inverse: bool):
    """Transposed DFT matrix pair W^T (numpy float32)."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = (2.0 if inverse else -2.0) * np.pi * (j * k % n) / n
    return (
        np.ascontiguousarray(np.cos(ang).astype(np.float32).T),
        np.ascontiguousarray(np.sin(ang).astype(np.float32).T),
    )


def _twiddle(f1: int, f2: int, inverse: bool):
    """[f1, f2] twiddle W_{f1 f2}^{k1 r} pair (numpy float32)."""
    n = f1 * f2
    kk, rr = np.meshgrid(np.arange(f1), np.arange(f2), indexing="ij")
    ang = (2.0 if inverse else -2.0) * np.pi * (kk * rr % n) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fft2_consts(n: int, inverse: bool) -> list[np.ndarray]:
    """Constants for the two-stage FFT, in consumption order."""
    if n <= _MAX_RADIX:
        return list(_dft_wt(n, inverse))
    f1, f2 = _split2(n)
    return [
        *_dft_wt(f1, inverse),
        *_twiddle(f1, f2, inverse),
        *_dft_wt(f2, inverse),
    ]


class _ConstFeed:
    def __init__(self, refs):
        self.refs = list(refs)
        self.i = 0

    def take(self):
        ref = self.refs[self.i]
        self.i += 1
        return ref[...]


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cdot2(wt_r, wt_i, ar, ai):
    rr = _dot(wt_r, ar)
    ii = _dot(wt_i, ai)
    ri = _dot(wt_r, ai)
    ir = _dot(wt_i, ar)
    return rr - ii, ri + ir


def _fft2_real(x_row, n, feed):
    """Two-stage FFT of a REAL [1, n] row -> pair of [1, n] (natural order).

    First stage needs only 2 matmuls (imag input is zero).
    """
    if n <= _MAX_RADIX:
        wt_r = feed.take()
        wt_i = feed.take()
        col = x_row.reshape(n, 1)
        return _dot(wt_r, col).reshape(1, n), _dot(wt_i, col).reshape(1, n)
    f1, f2 = _split2(n)
    a = x_row.reshape(f1, f2)
    wt1_r = feed.take()
    wt1_i = feed.take()
    sr = _dot(wt1_r, a)
    si = _dot(wt1_i, a)
    t_r = feed.take()
    t_i = feed.take()
    cr = sr * t_r - si * t_i
    ci = sr * t_i + si * t_r
    wt2_r = feed.take()
    wt2_i = feed.take()
    dr, di = _cdot2(wt2_r, wt2_i, cr.T, ci.T)  # [k2, k1]
    return dr.reshape(1, n), di.reshape(1, n)


def _fft2_complex(zr, zi, n, feed):
    """Two-stage FFT of a complex pair given as [f1, f2] matrices (row-major
    natural input order) -> [k2, k1] pair (row-major natural output)."""
    if n <= _MAX_RADIX:
        wt_r = feed.take()
        wt_i = feed.take()
        return _cdot2(wt_r, wt_i, zr.reshape(n, 1), zi.reshape(n, 1))
    wt1_r = feed.take()
    wt1_i = feed.take()
    sr, si = _cdot2(wt1_r, wt1_i, zr, zi)
    t_r = feed.take()
    t_i = feed.take()
    cr = sr * t_r - si * t_i
    ci = sr * t_i + si * t_r
    wt2_r = feed.take()
    wt2_i = feed.take()
    return _cdot2(wt2_r, wt2_i, cr.T, ci.T)  # [k2, k1]


def _plan_consts(cfg: OverlapSaveConfig) -> list[np.ndarray]:
    consts = list(_fft2_consts(cfg.frame_in, inverse=False))
    consts.extend(_fft2_consts(cfg.fft_size // 2, inverse=True))
    return consts


def fold_spectrum(spectrum, fft_size: int):
    """Fold the rfft filter spectrum (re, im) pair [h+1] into G1/G2 (see
    module docstring). Pure jnp: runs under jit, the flip stays in the XLA
    graph outside the Pallas kernel; hot-swap never recompiles."""
    hr, hi = spectrum
    h = fft_size // 2
    k = np.arange(h)
    w = np.exp(-2j * np.pi * k / fft_size)
    a = 0.5 * (1.0 - 1j * w)
    b = 0.5 * (1.0 + 1j * w)
    ca_r = jnp.asarray(a.real.astype(np.float32))
    ca_i = jnp.asarray((-a.imag).astype(np.float32))  # conj(A)
    cb_r = jnp.asarray(b.real.astype(np.float32))
    cb_i = jnp.asarray((-b.imag).astype(np.float32))  # conj(B)
    h_r = hr[:h]
    h_i = hi[:h]
    hrev_r = jnp.flip(hr[1:])     # H[h-k], k = 0..h-1
    hrev_i = -jnp.flip(hi[1:])    # conj
    g1_r = ca_r * h_r - ca_i * h_i
    g1_i = ca_r * h_i + ca_i * h_r
    g2_r = cb_r * hrev_r - cb_i * hrev_i
    g2_i = cb_r * hrev_i + cb_i * hrev_r
    f1, f2 = _split2(h) if h > _MAX_RADIX else (h, 1)
    shape = (f1, f2)
    return (g1_r.reshape(shape), g1_i.reshape(shape),
            g2_r.reshape(shape), g2_i.reshape(shape))


def _fused_kernel(*refs, cfg: OverlapSaveConfig):
    (*const_refs, g1r_ref, g1i_ref, g2r_ref, g2i_ref, frame_ref,
     out_e_ref, out_o_ref) = refs
    feed = _ConstFeed(const_refs)
    m = cfg.frame_in
    h = cfg.fft_size // 2
    f1, f2 = _split2(h) if h > _MAX_RADIX else (h, 1)

    x = frame_ref[...].reshape(1, m)
    xf_r, xf_i = _fft2_real(x, m, feed)  # [1, m] full DFT, natural order

    # Zero-stuffed spectrum on the half grid: E[k] = Xf[k mod m].
    reps = h // m
    if reps > 1:
        er = jnp.tile(xf_r, (1, reps)).reshape(f1, f2)
        ei = jnp.tile(xf_i, (1, reps)).reshape(f1, f2)
        e2r, e2i = er, ei
    elif reps == 1:
        er = xf_r.reshape(f1, f2)
        ei = xf_i.reshape(f1, f2)
        e2r, e2i = er, ei
    else:  # ratio == 1: h = m // 2; the second term reads the upper half.
        er = xf_r[:, :h].reshape(f1, f2)
        ei = xf_i[:, :h].reshape(f1, f2)
        e2r = xf_r[:, h:].reshape(f1, f2)
        e2i = xf_i[:, h:].reshape(f1, f2)

    g1r = g1r_ref[...]
    g1i = g1i_ref[...]
    g2r = g2r_ref[...]
    g2i = g2i_ref[...]
    zr = er * g1r - ei * g1i + e2r * g2r - e2i * g2i
    zi = er * g1i + ei * g1r + e2r * g2i + e2i * g2r

    yr, yi = _fft2_complex(zr, zi, h, feed)  # [k2, k1], unnormalized
    scale = jnp.float32(1.0 / h)
    j0 = cfg.overlap // 2  # kept z-domain range: j in [j0, h)
    flat_r = yr.reshape(1, h)[:, j0:] * scale
    flat_i = yi.reshape(1, h)[:, j0:] * scale
    out_e_ref[...] = flat_r[None]  # out[2j]   = Re z[j]
    out_o_ref[...] = flat_i[None]  # out[2j+1] = Im z[j]


@functools.lru_cache(maxsize=16)
def _build_fused(cfg: OverlapSaveConfig, interpret: bool = False):
    if cfg.overlap % 2 != 0:
        raise ValueError(
            "fused kernel requires an even overlap (taps odd); "
            f"got taps={cfg.taps}"
        )
    consts = _plan_consts(cfg)
    const_arrays = [jnp.asarray(c) for c in consts]
    kernel = functools.partial(_fused_kernel, cfg=cfg)
    h = cfg.fft_size // 2
    f1, f2 = _split2(h) if h > _MAX_RADIX else (h, 1)
    half_block = cfg.block_size // 2

    const_specs = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]
    g_spec = pl.BlockSpec((f1, f2), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    half_spec = pl.BlockSpec((1, 1, half_block), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def call(frames, g1r, g1i, g2r, g2i):
        n = frames.shape[0]
        frames3 = frames.reshape(n, 1, cfg.frame_in)
        out_e, out_o = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=const_specs + [
                g_spec, g_spec, g_spec, g_spec,
                pl.BlockSpec((1, 1, cfg.frame_in), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(half_spec, half_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n, 1, half_block), jnp.float32),
                jax.ShapeDtypeStruct((n, 1, half_block), jnp.float32),
            ),
            interpret=interpret,
        )(*const_arrays, g1r, g1i, g2r, g2i, frames3)
        # Interleave even/odd outside the kernel (no strided stores in
        # Mosaic): out[2j] = e[j], out[2j+1] = o[j].
        stacked = jnp.stack(
            [out_e.reshape(n, half_block), out_o.reshape(n, half_block)],
            axis=-1,
        )
        return stacked.reshape(n, cfg.block_size)

    return jax.jit(call)


def fused_upsample_frames(
    frames: jnp.ndarray, spectrum, cfg: OverlapSaveConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, frame_in] frames -> [N, block_size] blocks via the fused kernel.

    ``spectrum`` is the (re, im) pair from ops.overlap_save.filter_spectrum
    (hot-swappable: folded into G1/G2 under jit, traced into the kernel).
    """
    g = fold_spectrum(spectrum, cfg.fft_size)
    call = _build_fused(cfg, interpret)
    return call(frames, *g)


def fused_upsample_blocks(
    x: jnp.ndarray, spectrum, cfg: OverlapSaveConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.overlap_save.upsample_blocks using the fused kernel.

    x: [..., halo_in + B*block_in] -> [..., B*block_size].
    """
    from totton_tpu.ops.overlap_save import frame_input

    frames = frame_input(x, cfg.block_in, cfg.halo_in)
    lead = frames.shape[:-1]
    flat = frames.reshape((-1, cfg.frame_in))
    y = fused_upsample_frames(flat, spectrum, cfg, interpret)
    return y.reshape(lead[:-1] + (-1,))
