"""Overlap-save frequency-domain FIR upsampling — the framework's hot path.

TPU-native re-design of the reference engine's ProcessBlock
(src/vulkan/vulkan_streaming_upsampler.cpp:500-596). The reference runs, per
block and per channel: full-size complex FFT of the zero-stuffed signal on
GPU, a *CPU-side* pointwise multiply in mapped memory, and a full-size
inverse FFT. This implementation differs structurally:

1. **Zero-stuffing is free.** The DFT of a zero-stuffed signal is the
   periodic extension of the compact signal's DFT:
       u[n] = x[n/r] if r | n else 0   =>   U[k] = X[k mod M],  N = r*M.
   So the forward transform is an rfft of length fft_size/ratio on the
   *input-rate* frame (16x smaller at ratio 16) plus an O(N) gather —
   never materializing the zero-stuffed signal.

2. **No sequential state.** Overlap-save needs only the previous taps-1
   *input* samples (a halo), not carried output state. All blocks compute in
   parallel: batched [channels, blocks, frame] rffts -> spectral multiply ->
   batched irffts. Streaming mode just carries the last halo_in input
   samples; time-sharding across chips exchanges the same halo via
   jax.lax.ppermute (see totton_tpu.parallel).

3. **The spectral multiply is fused on-device** by XLA into the FFT
   pipeline — fixing the reference's GPU->CPU->GPU round trip.

All transforms are the in-house matmul FFT (totton_tpu.ops.fft — this TPU
backend implements neither the FFT HLO nor complex dtypes), with spectra in
real-pair (re, im) float32 form. The filter spectrum is precomputed in
float64 on host and cast once; runtime signal path is float32 like the
reference (src/vulkan/fft_utils.h:30).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from totton_tpu.ops import fft as _fft


@dataclasses.dataclass(frozen=True)
class OverlapSaveConfig:
    """Static geometry of one overlap-save convolver.

    Invariants mirror the sidecar contract (docs/filter_format.md):
    fft_size power of two, fft_size - block_size == taps - 1,
    block_size % ratio == 0, and (taps - 1) % ratio == 0.
    """

    taps: int
    fft_size: int
    block_size: int
    ratio: int

    def __post_init__(self) -> None:
        if self.fft_size & (self.fft_size - 1):
            raise ValueError(f"fft_size must be a power of two: {self.fft_size}")
        if self.fft_size - self.block_size != self.taps - 1:
            raise ValueError(
                f"overlap-save invariant violated: {self.fft_size} - "
                f"{self.block_size} != {self.taps} - 1"
            )
        if self.ratio < 1 or (self.ratio & (self.ratio - 1)):
            raise ValueError(f"ratio must be a power of two >= 1: {self.ratio}")
        if self.block_size % self.ratio != 0:
            raise ValueError("block_size must be divisible by ratio")
        if (self.taps - 1) % self.ratio != 0:
            raise ValueError("(taps - 1) must be divisible by ratio")
        if self.ratio > 1 and (self.fft_size // self.ratio) % 2 != 0:
            raise ValueError("fft_size / ratio must be even")

    @classmethod
    def from_sidecar(cls, sidecar) -> "OverlapSaveConfig":
        return cls(
            taps=sidecar.taps,
            fft_size=sidecar.fft_size,
            block_size=sidecar.block_size,
            ratio=sidecar.upsample_factor,
        )

    @property
    def overlap(self) -> int:
        """History carried between blocks, in output-rate samples."""
        return self.taps - 1

    @property
    def frame_in(self) -> int:
        """Input-rate samples entering each FFT frame (= fft_size / ratio)."""
        return self.fft_size // self.ratio

    @property
    def block_in(self) -> int:
        """Fresh input-rate samples consumed per block."""
        return self.block_size // self.ratio

    @property
    def halo_in(self) -> int:
        """Input-rate history samples each block needs (= (taps-1) / ratio)."""
        return (self.taps - 1) // self.ratio

    @property
    def n_bins(self) -> int:
        """rfft bins at the output rate."""
        return self.fft_size // 2 + 1


def filter_spectrum(
    taps: np.ndarray,
    fft_size: int,
    eq_response: np.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the filter's rfft spectrum, optionally with EQ baked in.

    Computed in float64 on host (numpy) and cast to a float32 pair once — the
    runtime FFT noise floor then dominates, not the spectrum precompute
    (the reference computes this in float32 via its CPU FFT,
    vulkan_streaming_upsampler.cpp:726-753; float64 here is strictly better).

    ``eq_response`` is a real magnitude or complex response sampled on the
    same rfft bin grid (len fft_size//2 + 1) at the output rate — the
    "EQ baked into the filter spectrum" path (reference:
    include/audio/eq_to_fir.h:34-37).
    """
    h = np.asarray(taps, dtype=np.float64)
    if len(h) > fft_size:
        raise ValueError(f"taps ({len(h)}) longer than fft_size ({fft_size})")
    spectrum = np.fft.rfft(h, fft_size)
    if eq_response is not None:
        eq_response = np.asarray(eq_response)
        if eq_response.shape != spectrum.shape:
            raise ValueError(
                f"eq_response shape {eq_response.shape} != rfft bins "
                f"{spectrum.shape}"
            )
        spectrum = spectrum * eq_response
    # Real-pair representation (this TPU backend has no complex dtype).
    return (
        jnp.asarray(spectrum.real.astype(np.float32)),
        jnp.asarray(spectrum.imag.astype(np.float32)),
    )


def zero_stuff(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """Insert ratio-1 zeros after each sample along the last axis.

    Reference semantics (vulkan_streaming_upsampler.cpp:532-534): sample i
    lands at position i*ratio. Used by tests/oracles; the hot path never
    materializes this (see module docstring).
    """
    if ratio == 1:
        return x
    shape = x.shape[:-1] + (x.shape[-1], ratio)
    out = jnp.zeros(shape, dtype=x.dtype)
    out = out.at[..., 0].set(x)
    return out.reshape(x.shape[:-1] + (x.shape[-1] * ratio,))


def frame_input(x: jnp.ndarray, block_in: int, halo_in: int) -> jnp.ndarray:
    """Frame [..., halo_in + B*block_in] -> [..., B, halo_in + block_in].

    frames[i] = x[i*block_in : i*block_in + halo_in + block_in] — overlapping
    windows built from K+1 shifted contiguous slices of a reshape (no gather),
    where K = ceil(halo_in / block_in). XLA-friendly: static shapes, slices,
    one concat.
    """
    n = x.shape[-1]
    if (n - halo_in) % block_in != 0:
        raise ValueError(
            f"input length {n} minus halo {halo_in} must be a multiple of "
            f"block_in {block_in}"
        )
    num_blocks = (n - halo_in) // block_in
    k = -(-halo_in // block_in)  # ceil
    pad = k * block_in - halo_in
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, 0)])
    blocks = xp.reshape(x.shape[:-1] + (k + num_blocks, block_in))
    wide = jnp.concatenate(
        [blocks[..., i : i + num_blocks, :] for i in range(k + 1)], axis=-1
    )
    return wide[..., pad:]


def _periodic_rfft_extend(sr: jnp.ndarray, si: jnp.ndarray, ratio: int):
    """Extend rfft(frame, M) to the rfft grid of the zero-stuffed length r*M.

    U[k] = X[k mod M] for k in [0, r*M/2]; the full period of X is rebuilt
    from the rfft half via Hermitian symmetry (conj = negated imag).
    """
    if ratio == 1:
        return sr, si
    reps = ratio // 2
    batch = (1,) * (sr.ndim - 1)
    full_r = jnp.concatenate([sr[..., :-1], sr[..., -1:0:-1]], axis=-1)
    full_i = jnp.concatenate([si[..., :-1], -si[..., -1:0:-1]], axis=-1)
    out_r = jnp.concatenate(
        [jnp.tile(full_r, batch + (reps,)), sr[..., :1]], axis=-1
    )
    out_i = jnp.concatenate(
        [jnp.tile(full_i, batch + (reps,)), si[..., :1]], axis=-1
    )
    return out_r, out_i


def _fold_g(spectrum, fft_size: int):
    """Fold the rfft filter spectrum [h+1] pair into the G1/G2 arrays of
    the reversal-free formulation (see upsample_frames docstring)."""
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
    hrev_r = jnp.flip(hr[1:])      # H[h-k], k = 0..h-1
    hrev_i = -jnp.flip(hi[1:])     # conj
    # Fold the inverse transform's 1/h normalization into G (one fewer
    # full-array pass at runtime).
    inv_h = np.float32(1.0 / h)
    g1 = ((ca_r * h_r - ca_i * h_i) * inv_h,
          (ca_r * h_i + ca_i * h_r) * inv_h)
    g2 = ((cb_r * hrev_r - cb_i * hrev_i) * inv_h,
          (cb_r * hrev_i + cb_i * hrev_r) * inv_h)
    return g1, g2


def upsample_frames(
    frames: jnp.ndarray, spectrum, cfg: OverlapSaveConfig
) -> jnp.ndarray:
    """[..., frame_in] input-rate frames -> [..., block_size] output blocks.

    Reversal-free folded formulation (shared with the fused Pallas kernel,
    ops/pallas_kernels.py): the forward transform is the FULL m-point DFT
    of the real frame (m = frame_in); its periodic tiling
    E[k] = Xf[k mod m] is the zero-stuffed spectrum; the inverse-real-FFT
    untangling and the filter multiply collapse into Z = E*G1 + E2*G2 via
    the Hermitian identity E[h-k] = conj(E[k]); then one half-size complex
    ifft and an even/odd interleave yield the output-rate block, and the
    first taps-1 samples are discarded (overlap-save). All transforms are
    the in-house matmul FFT (totton_tpu.ops.fft) in real-pair form.

    Falls back to the classic rfft/extension/irfft pipeline when the
    overlap is odd (taps even — the z-domain slice needs overlap % 2 == 0).
    """
    m = cfg.frame_in
    h = cfg.fft_size // 2
    if cfg.overlap % 2 != 0:
        return _upsample_frames_classic(frames, spectrum, cfg)

    (g1r, g1i), (g2r, g2i) = _fold_g(spectrum, cfg.fft_size)
    xr, xi = _fft.fft2_real(frames.astype(jnp.float32), m)
    reps = h // m
    batch = (1,) * (xr.ndim - 1)
    if reps > 1:
        er = jnp.tile(xr, batch + (reps,))
        ei = jnp.tile(xi, batch + (reps,))
        e2r, e2i = er, ei
    elif reps == 1:
        er, ei = xr, xi
        e2r, e2i = er, ei
    else:  # ratio == 1: h = m // 2; second term reads the upper half.
        er, ei = xr[..., :h], xi[..., :h]
        e2r, e2i = xr[..., h:], xi[..., h:]
    zr = er * g1r - ei * g1i + e2r * g2r - e2i * g2i
    zi = er * g1i + ei * g1r + e2r * g2i + e2i * g2r
    # Unnormalized inverse: 1/h is folded into G above.
    tr, ti = _fft._fft_rec(zr, zi, _fft._factorize(h), inverse=True)
    # out[2j] = Re z[j], out[2j+1] = Im z[j]; keep j >= overlap/2.
    j0 = cfg.overlap // 2
    out = jnp.stack([tr[..., j0:], ti[..., j0:]], axis=-1)
    return out.reshape(frames.shape[:-1] + (cfg.block_size,))


def _upsample_frames_classic(
    frames: jnp.ndarray, spectrum, cfg: OverlapSaveConfig
) -> jnp.ndarray:
    """rfft -> periodic extension -> x H -> irfft -> discard (fallback)."""
    hr, hi = spectrum
    xr, xi = _fft.rfft2(frames.astype(jnp.float32), cfg.frame_in)
    er, ei = _periodic_rfft_extend(xr, xi, cfg.ratio)
    yr, yi = _fft.complex_mul(er, ei, hr, hi)
    y = _fft.irfft2(yr, yi, cfg.fft_size)
    return y[..., cfg.overlap :]


def upsample_blocks(
    x: jnp.ndarray, spectrum, cfg: OverlapSaveConfig
) -> jnp.ndarray:
    """Upsample a contiguous input carrying its own history.

    x: [..., halo_in + B*block_in] float32 at the input rate; the first
    halo_in samples are history (zeros at stream start).
    Returns [..., B*block_size] float32 at the output rate.
    """
    frames = frame_input(x, cfg.block_in, cfg.halo_in)
    blocks = upsample_frames(frames, spectrum, cfg)
    return blocks.reshape(x.shape[:-1] + (blocks.shape[-2] * cfg.block_size,))


@functools.lru_cache(maxsize=64)
def make_block_step(cfg: OverlapSaveConfig):
    """Jitted streaming step: (tail, x, spectrum) -> (y, new_tail).

    tail: [C, halo_in] carried input history; x: [C, B*block_in] fresh input;
    returns y: [C, B*block_size] and the updated tail. The spectrum is a
    traced argument, so filter hot-swap (RELOAD) never recompiles.
    """

    @jax.jit
    def step(tail: jnp.ndarray, x: jnp.ndarray, spectrum: jnp.ndarray):
        xin = jnp.concatenate([tail, x], axis=-1)
        y = upsample_blocks(xin, spectrum, cfg)
        new_tail = xin[..., -cfg.halo_in :] if cfg.halo_in else tail[..., :0]
        return y, new_tail

    return step
