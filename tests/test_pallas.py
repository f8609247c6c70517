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
from totton_tpu.experimental.pallas_kernels import (
    _pick_split,
    _uses_perm_e,
    fold_spectrum,
    fused_upsample_blocks,
)


class TestPickSplit:
    def test_balanced_lane_floor(self):
        # Balanced split; f2 (lanes) stays >= 128; f1 (rows) <= 512.
        assert _pick_split(65536) == (256, 256)
        assert _pick_split(131072) == (256, 512)
        assert _pick_split(262144) == (512, 512)
        assert _pick_split(16384) == (128, 128)
        assert _pick_split(8192) == (64, 128)

    def test_too_large(self):
        with pytest.raises(ValueError, match="too large"):
            _pick_split(1 << 20)

    def test_non_pow2(self):
        with pytest.raises(ValueError, match="power-of-two"):
            _pick_split(100)

    def test_production_16x_uses_perm_e(self):
        cfg = OverlapSaveConfig(taps=80001, fft_size=131072,
                                block_size=51072, ratio=16)
        assert _uses_perm_e(cfg)
        cfg8 = OverlapSaveConfig(taps=80001, fft_size=131072,
                                 block_size=51072, ratio=8)
        assert not _uses_perm_e(cfg8)  # m = 16384 -> f1 = 128, natural row ok


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
    assert g1r.shape == g2i.shape == (8, 128)  # h=1024 -> [8, 128]



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
