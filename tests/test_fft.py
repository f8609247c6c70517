"""In-house matmul FFT vs numpy float64 oracles.

This FFT (real-pair Cooley-Tukey over MXU matmuls) is the framework's core
transform — the TPU backend implements neither XLA's FFT HLO nor complex
dtypes. SNR gates are set near the float32 noise floor.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from totton_tpu.ops import fft as tfft


def snr_db(y, ref):
    err = np.sum(np.abs(np.asarray(y, np.complex128) - ref) ** 2)
    return 10 * np.log10(np.sum(np.abs(ref) ** 2) / max(err, 1e-300))


@pytest.mark.parametrize("n", [2, 8, 128, 512, 1024, 8192, 131072])
def test_fft_matches_numpy(rng, n):
    xr = rng.normal(size=(2, n)).astype(np.float32)
    xi = rng.normal(size=(2, n)).astype(np.float32)
    yr, yi = tfft.fft2(jnp.asarray(xr), jnp.asarray(xi))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi)
    assert snr_db(y, ref) > 125.0


@pytest.mark.parametrize("n", [8, 1024, 131072])
def test_ifft_matches_numpy(rng, n):
    xr = rng.normal(size=(2, n)).astype(np.float32)
    xi = rng.normal(size=(2, n)).astype(np.float32)
    yr, yi = tfft.ifft2(jnp.asarray(xr), jnp.asarray(xi))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.ifft(xr.astype(np.complex128) + 1j * xi)
    assert snr_db(y, ref) > 125.0


@pytest.mark.parametrize("n", [2, 8, 1024, 8192, 131072])
def test_rfft_matches_numpy(rng, n):
    x = rng.normal(size=(3, n)).astype(np.float32)
    yr, yi = tfft.rfft2(jnp.asarray(x))
    assert yr.shape == (3, n // 2 + 1)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.rfft(x.astype(np.float64))
    assert snr_db(y, ref) > 125.0


@pytest.mark.parametrize("n", [2, 8, 1024, 131072])
def test_irfft_matches_numpy(rng, n):
    x = rng.normal(size=(2, n))
    bins = np.fft.rfft(x)
    y = tfft.irfft2(
        jnp.asarray(bins.real.astype(np.float32)),
        jnp.asarray(bins.imag.astype(np.float32)),
        n,
    )
    ref = np.fft.irfft(bins, n)
    assert snr_db(np.asarray(y).astype(np.complex128), ref) > 120.0


def test_round_trip(rng):
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    yr, yi = tfft.rfft2(jnp.asarray(x))
    back = np.asarray(tfft.irfft2(yr, yi, 4096))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_fft_of_impulse_is_flat(rng):
    x = np.zeros((1, 1024), np.float32)
    x[0, 0] = 1.0
    yr, yi = tfft.rfft2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yr), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), 0.0, atol=1e-5)


def test_zero_padding(rng):
    x = rng.normal(size=(1, 100)).astype(np.float32)
    yr, yi = tfft.rfft2(jnp.asarray(x), 256)
    ref = np.fft.rfft(x.astype(np.float64), 256)
    assert snr_db(np.asarray(yr) + 1j * np.asarray(yi), ref) > 125.0


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError, match="power of two"):
        tfft.fft2(jnp.zeros((1, 12)), jnp.zeros((1, 12)))


def test_irfft_bad_bin_count():
    with pytest.raises(ValueError, match="bins"):
        tfft.irfft2(jnp.zeros((1, 5)), jnp.zeros((1, 5)), 16)


@pytest.mark.parametrize("n", [1024, 2048, 8192])
def test_fft2_real_split_matches_natural_order(rng, n):
    """The pre-transpose split layout is the natural-order FFT with
    k = k2*P + k1 (consumed transpose-free by the absorbed overlap-save
    stage 1)."""
    x = rng.normal(size=(3, n)).astype(np.float32)
    dr, di, p, q = tfft.fft2_real_split(jnp.asarray(x), n)
    assert (p * q, dr.shape[-2:]) == (n, (p, q))
    nat = np.swapaxes(np.asarray(dr), -1, -2).reshape(3, n) + 1j * (
        np.swapaxes(np.asarray(di), -1, -2).reshape(3, n))
    ref = np.fft.fft(x.astype(np.float64), n)
    assert snr_db(nat, ref) > 120.0


def test_fft2_real_split_rejects_single_stage():
    with pytest.raises(ValueError, match="two-stage"):
        tfft.fft2_real_split(jnp.zeros((1, 256)), 256)
