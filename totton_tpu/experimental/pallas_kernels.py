"""Fused Pallas kernel for overlap-save upsampling — EXPERIMENTAL, NOT
SHIPPED.

Status: documented NO-GO on this environment (PERF.md round 2, "Fused
Pallas kernel: NO-GO"): measured 9x slower than the XLA path on hardware
(one frame per grid program -> ~1% MXU utilization), the XLA composition
already runs 2x faster than its own isolated stages, and at 2x the XLA
pipeline executes at ~97% of the calibrated matmul ceiling. Nothing
imports this module from the production package; tests exercise it in
interpret mode only, so hardware behavior claims below describe the
round-1/2 measurement sessions, not a maintained path.

The XLA-composed pipeline (ops/overlap_save.py) is data-movement bound:
every FFT stage round-trips its [*, 65536]-pair intermediates through HBM
(~3 MB per frame; PERF.md). This kernel runs one frame's ENTIRE pipeline in
VMEM, touching HBM only for the frame in (32 KB at 16x), the block out
(204 KB), and VMEM-resident constants (DFT/twiddle matrices + the folded
spectrum; constant index maps keep them loaded across grid steps).

The in-kernel formulation is shaped by what this backend's Mosaic compiler
supports (probed op-by-op; see PERF.md):

- values are strictly 2D (3D reshapes/transposes crash the remote
  compiler); no `rev`; no strided stores; reshapes that SPLIT the lane
  dimension must target >= 128 lanes, and lane MERGES need a >= 128-lane
  source.
- **Two-stage four-step FFT, transpose-free until the end**: for
  n = f1*f2 (f2 in {128,256,512}), reshape [f1, f2]; stage 1 contracts
  rows (W_f1 matmul from the left); 2D twiddle; stage 2 contracts lanes
  (W_f2 matmul from the right) giving M[k1, k2] with natural order
  M.T.flat; the single transpose lands on a >= 128-lane target.
- **No real-FFT untangling reversals**: the forward computes the FULL
  m-point DFT of the real frame (2-matmul first stage); its periodic
  tiling E[k] = Xf[k mod m] is the zero-stuffed spectrum; by Hermitian
  symmetry E[h-k] = conj(E[k]), the inverse-real-FFT untangle + filter
  multiply collapse into Z = E*G1 + E2*G2 with host-folded G arrays
  (fold_spectrum — traced, so filter/EQ hot-swap never recompiles).
- For the production 16x geometry (m = 8192: f1 = 64 < 128 forbids the
  natural-row merge), E is built directly from the transposed stage
  output with two 0/1 permutation matmuls + a lane concat.
- Even/odd output halves are emitted separately (out[2j] = Re z[j],
  out[2j+1] = Im z[j] would need a strided store) and interleaved by XLA
  outside the kernel.

Hardware support envelope: frame_in >= 16384, or the 16x production frame
(8192); fft_size/2 >= 16384. Anything smaller runs in interpret mode
(tests) or falls back to the XLA path.

Grid: one program per (channel x block) frame; frames arrive pre-framed
[N, frame_in].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from totton_tpu.ops.overlap_save import OverlapSaveConfig

_MAX_ROWS = 512      # max rows of the stage-1 DFT matmul
_LANE = 128          # minimum lane width for splits/merges on hardware


def _pick_split(n: int) -> tuple[int, int]:
    """(f1, f2) with n = f1*f2, f2 in {128, 256, 512}, f1 <= 512.

    For n < 16384 this yields f1 < 128 — compilable only in interpret mode
    (the final merge needs >= 128 lanes on hardware) unless the caller uses
    the permuted-E path.
    """
    if n == 0 or n & (n - 1):
        raise ValueError(f"power-of-two size required, got {n}")
    log = n.bit_length() - 1
    f2 = max(_LANE, 1 << ((log + 1) // 2))  # balanced, lanes >= 128
    f1 = n // f2
    if f1 > _MAX_ROWS or f2 > 512:
        raise ValueError(f"size {n} too large for two radix-512 stages")
    return f1, f2


def _dft_w(n: int, inverse: bool):
    """Symmetric DFT matrix pair W[j, k] = exp(-+2pi i jk/n) (numpy f32)."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ang = (2.0 if inverse else -2.0) * np.pi * (j * k % n) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _twiddle(f1: int, f2: int, inverse: bool):
    """[f1, f2] twiddle W_{f1 f2}^{k1 b} pair (numpy f32)."""
    n = f1 * f2
    kk, bb = np.meshgrid(np.arange(f1), np.arange(f2), indexing="ij")
    ang = (2.0 if inverse else -2.0) * np.pi * (kk * bb % n) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fft_consts(n: int, inverse: bool) -> list[np.ndarray]:
    if n <= _LANE:
        return list(_dft_w(n, inverse))
    f1, f2 = _pick_split(n)
    return [
        *_dft_w(f1, inverse),
        *_twiddle(f1, f2, inverse),
        *_dft_w(f2, inverse),
    ]


def _perm_consts(f1h: int, f2h: int, f2m: int, f1m: int) -> list[np.ndarray]:
    """0/1 row-selection matrices building E from the transposed forward
    output Mt [f2m, f1m] when the natural-row merge is unavailable
    (f1m < 128). E_mat[P, q*f1m : (q+1)*f1m] = Mt[(s*P + q) mod f2m, :]
    with s = f2h // f1m lane sections."""
    s = f2h // f1m
    mats = []
    for q in range(s):
        p = np.zeros((f1h, f2m), dtype=np.float32)
        rows = (np.arange(f1h) * s + q) % f2m
        p[np.arange(f1h), rows] = 1.0
        mats.append(p)
    return mats


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


def _stage2_tail(sr, si, feed):
    """Twiddle + lane-contraction stage shared by real/complex variants.
    Input/output [f1, f2]; output M[k1, k2], natural order = M.T.flat."""
    t_r = feed.take()
    t_i = feed.take()
    cr = sr * t_r - si * t_i
    ci = sr * t_i + si * t_r
    w2_r = feed.take()
    w2_i = feed.take()
    mr = _dot(cr, w2_r) - _dot(ci, w2_i)
    mi = _dot(cr, w2_i) + _dot(ci, w2_r)
    return mr, mi


def _fft_mat_real(x_mat, feed):
    """Full DFT of a real [f1, f2] natural-split frame -> M[k1, k2]."""
    w1_r = feed.take()
    w1_i = feed.take()
    sr = _dot(w1_r, x_mat)
    si = _dot(w1_i, x_mat)
    return _stage2_tail(sr, si, feed)


def _fft_mat_complex(zr, zi, feed):
    """Full DFT of a complex [f1, f2] natural-split pair -> M[k1, k2]."""
    w1_r = feed.take()
    w1_i = feed.take()
    sr = _dot(w1_r, zr) - _dot(w1_i, zi)
    si = _dot(w1_r, zi) + _dot(w1_i, zr)
    return _stage2_tail(sr, si, feed)


def _uses_perm_e(cfg: OverlapSaveConfig) -> bool:
    """True when the forward output must feed E via permutation matmuls
    (f1m < 128 forbids the natural-row merge) — the production 16x case."""
    m = cfg.frame_in
    if m <= _LANE:
        return False
    f1m, _ = _pick_split(m)
    return f1m < _LANE and cfg.ratio >= 2


def _plan_consts(cfg: OverlapSaveConfig) -> list[np.ndarray]:
    m = cfg.frame_in
    h = cfg.fft_size // 2
    consts = list(_fft_consts(m, inverse=False))
    if _uses_perm_e(cfg):
        f1m, f2m = _pick_split(m)
        f1h, f2h = _pick_split(h)
        consts.extend(_perm_consts(f1h, f2h, f2m, f1m))
    consts.extend(_fft_consts(h, inverse=True))
    return consts


def fold_spectrum(spectrum, fft_size: int):
    """Fold the rfft filter spectrum (re, im) pair [h+1] into G1/G2 (see
    module docstring):

      G1[k] = conj(A_k) H[k],   G2[k] = conj(B_k) conj(H[h-k]),
      A_k = (1 - i W^k)/2,      B_k = (1 + i W^k)/2,  W = e^{-2pi i/fft}.

    Pure jnp: runs under jit, the flip stays in the XLA graph outside the
    Pallas kernel; hot-swap never recompiles."""
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
    h_r, h_i = hr[:h], hi[:h]
    hrev_r = jnp.flip(hr[1:])     # H[h-k], k = 0..h-1
    hrev_i = -jnp.flip(hi[1:])    # conj
    g1_r = ca_r * h_r - ca_i * h_i
    g1_i = ca_r * h_i + ca_i * h_r
    g2_r = cb_r * hrev_r - cb_i * hrev_i
    g2_i = cb_r * hrev_i + cb_i * hrev_r
    shape = _pick_split(h) if h > _LANE else (1, h)
    return (g1_r.reshape(shape), g1_i.reshape(shape),
            g2_r.reshape(shape), g2_i.reshape(shape))


def _forward_spectrum(x, cfg, feed):
    """Frame [1, m] -> E/E2 matrices [f1h, f2h] (the zero-stuffed spectrum
    in the inverse stage's natural split).

    Stays in matrix form throughout: [1, m] single-row values get 8x
    sublane padding in VMEM (the source of a 2 MB scoped-vmem overflow in
    the first hardware compile), so tiling/slicing happens on
    [m//f2h, f2h] natural-order matrices via row concat / row slices.
    """
    m = cfg.frame_in
    h = cfg.fft_size // 2
    f1h, f2h = _pick_split(h) if h > _LANE else (1, h)

    if m <= _LANE:  # single-stage row DFT (interpret-only path)
        w_r = feed.take()
        w_i = feed.take()
        xf_r = _dot(x, w_r)
        xf_i = _dot(x, w_i)
        xm_r = xf_r.reshape(-1, f2h) if h > _LANE else xf_r
        xm_i = xf_i.reshape(-1, f2h) if h > _LANE else xf_i
    else:
        f1m, f2m = _pick_split(m)
        x_mat = x.reshape(f1m, f2m)
        mr, mi = _fft_mat_real(x_mat, feed)
        if _uses_perm_e(cfg):
            # E built from Mt without the (forbidden) lane-64 merge.
            mtr = mr.T  # [f2m, f1m]
            mti = mi.T
            f2h = _pick_split(h)[1] if h > _LANE else h
            nsel = f2h // f1m
            perms = [feed.take() for _ in range(nsel)]
            er = jnp.concatenate([_dot(p, mtr) for p in perms], axis=1)
            ei = jnp.concatenate([_dot(p, mti) for p in perms], axis=1)
            return er, ei, er, ei
        # Natural-order matrix with the inverse stage's lane width.
        xm_r = mr.T.reshape(m // f2h, f2h)
        xm_i = mi.T.reshape(m // f2h, f2h)

    reps = h // m
    if reps >= 1:
        # Flat tiling == vertical (row) tiling of the natural matrix.
        er = (jnp.concatenate([xm_r] * reps, axis=0) if reps > 1 else xm_r)
        ei = (jnp.concatenate([xm_i] * reps, axis=0) if reps > 1 else xm_i)
        return er, ei, er, ei
    # ratio == 1: h = m // 2; the second term reads the upper half (h is a
    # whole number of rows: h % f2h == 0).
    half_rows = h // f2h if h > _LANE else 1
    if h > _LANE:
        return (xm_r[:half_rows], xm_i[:half_rows],
                xm_r[half_rows:], xm_i[half_rows:])
    return (xm_r[:, :h], xm_i[:, :h], xm_r[:, h:], xm_i[:, h:])


def _fused_kernel(*refs, cfg: OverlapSaveConfig):
    (*const_refs, g1r_ref, g1i_ref, g2r_ref, g2i_ref, frame_ref,
     out_e_ref, out_o_ref) = refs
    feed = _ConstFeed(const_refs)
    h = cfg.fft_size // 2

    x = frame_ref[...].reshape(1, cfg.frame_in)
    er, ei, e2r, e2i = _forward_spectrum(x, cfg, feed)

    g1r = g1r_ref[...]
    g1i = g1i_ref[...]
    g2r = g2r_ref[...]
    g2i = g2i_ref[...]
    zr = er * g1r - ei * g1i + e2r * g2r - e2i * g2i
    zi = er * g1i + ei * g1r + e2r * g2i + e2i * g2r

    scale = jnp.float32(1.0 / h)
    j0 = cfg.overlap // 2  # kept z-domain range: j in [j0, h)
    if h <= _LANE:
        w_r = feed.take()
        w_i = feed.take()
        tr = _dot(zr, w_r) - _dot(zi, w_i)
        ti = _dot(zr, w_i) + _dot(zi, w_r)
        out_e_ref[...] = (tr[:, j0:] * scale)[None]
        out_o_ref[...] = (ti[:, j0:] * scale)[None]
        return
    # Matrix-form output: Mt = M.T [f2h, f1h] is the natural order
    # reshaped with row stride f1h. Emit whole rows from j0's row on; XLA
    # trims the sub-row remainder outside the kernel.
    f1h, _ = _pick_split(h)
    row0 = j0 // f1h
    mr, mi = _fft_mat_complex(zr, zi, feed)
    out_e_ref[...] = (mr.T[row0:] * scale)[None]  # out[2j]   = Re z[j]
    out_o_ref[...] = (mi.T[row0:] * scale)[None]  # out[2j+1] = Im z[j]


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
    g_shape = _pick_split(h) if h > _LANE else (1, h)
    half_block = cfg.block_size // 2
    j0 = cfg.overlap // 2

    const_specs = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]
    g_spec = pl.BlockSpec(g_shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    if h <= _LANE:
        out_rows, out_cols, rem = 1, half_block, 0
    else:
        f1h, f2h = _pick_split(h)
        row0 = j0 // f1h
        rem = j0 % f1h
        out_rows, out_cols = f2h - row0, f1h
    half_spec = pl.BlockSpec((1, out_rows, out_cols), lambda i: (i, 0, 0),
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
                jax.ShapeDtypeStruct((n, out_rows, out_cols), jnp.float32),
                jax.ShapeDtypeStruct((n, out_rows, out_cols), jnp.float32),
            ),
            interpret=interpret,
        )(*const_arrays, g1r, g1i, g2r, g2i, frames3)
        # Trim the sub-row remainder and interleave even/odd outside the
        # kernel (no strided stores in Mosaic): out[2j]=e[j], out[2j+1]=o[j].
        e = out_e.reshape(n, out_rows * out_cols)[:, rem : rem + half_block]
        o = out_o.reshape(n, out_rows * out_cols)[:, rem : rem + half_block]
        stacked = jnp.stack([e, o], axis=-1)
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
