"""Fused Pallas kernel vs the XLA overlap-save path (interpret mode — the
Mosaic-lowered path is exercised on TPU hardware by bench/perf runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from totton_tpu.ops.overlap_save import (
    OverlapSaveConfig,
    filter_spectrum,
    upsample_blocks,
)
from totton_tpu.ops.pallas_kernels import (
    _split2,
    fold_spectrum,
    fused_upsample_blocks,
)


class TestSplit2:
    def test_balanced(self):
        assert _split2(65536) == (256, 256)
        assert _split2(8192) == (128, 64)
        assert _split2(4096) == (64, 64)

    def test_too_large(self):
        with pytest.raises(ValueError, match="too large"):
            _split2(1 << 20)

    def test_non_pow2(self):
        with pytest.raises(ValueError, match="power-of-two"):
            _split2(100)


@pytest.mark.parametrize(
    "taps,fft,ratio",
    [(257, 2048, 4), (1025, 4096, 2), (1025, 8192, 16), (129, 1024, 1),
     (1025, 8192, 8)],
)
def test_fused_matches_xla_path(rng, taps, fft, ratio):
    cfg = OverlapSaveConfig(taps=taps, fft_size=fft,
                            block_size=fft - (taps - 1), ratio=ratio)
    h = rng.normal(size=taps)
    spec = filter_spectrum(h, fft)
    x = jnp.asarray(
        rng.normal(size=(2, cfg.halo_in + 3 * cfg.block_in)).astype(np.float32)
    )
    ref = np.asarray(upsample_blocks(x, spec, cfg))
    y = np.asarray(fused_upsample_blocks(x, spec, cfg, interpret=True))
    assert y.shape == ref.shape
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 2e-6


def test_fold_spectrum_shapes():
    spec = filter_spectrum(np.random.default_rng(0).normal(size=257), 2048)
    g1r, g1i, g2r, g2i = fold_spectrum(spec, 2048)
    assert g1r.shape == g2i.shape == (32, 32)  # h=1024 -> 32x32


def test_odd_overlap_rejected():
    # taps even -> odd overlap: the even/odd output split needs overlap%2==0.
    cfg = OverlapSaveConfig(taps=130, fft_size=1024, block_size=1024 - 129,
                            ratio=1)
    spec = filter_spectrum(np.zeros(130), 1024)
    with pytest.raises(ValueError, match="even overlap"):
        fused_upsample_blocks(
            jnp.zeros((1, cfg.halo_in + cfg.block_in)), spec, cfg,
            interpret=True,
        )
