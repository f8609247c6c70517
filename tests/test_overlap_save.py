"""Core overlap-save ops vs a naive direct-convolution oracle.

Strategy modeled on the reference's engine oracle test
(tests/cpp/test_vulkan_upsampler.cpp): tiny filters checked against direct
convolution, streaming continuity across block boundaries, zero-stuff
upsampling vs a ZeroStuff+Convolve oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from totton_tpu.ops.overlap_save import (
    OverlapSaveConfig,
    filter_spectrum,
    frame_input,
    make_block_step,
    upsample_blocks,
    zero_stuff,
)


def oracle_upsample(x: np.ndarray, h: np.ndarray, ratio: int) -> np.ndarray:
    """Direct zero-stuff + convolution oracle in float64."""
    up = np.zeros(len(x) * ratio)
    up[::ratio] = x
    return np.convolve(up, np.asarray(h, dtype=np.float64))[: len(up)]


def rel_err(y, ref):
    return np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)


class TestConfig:
    def test_bundled_geometry(self):
        cfg = OverlapSaveConfig(taps=80001, fft_size=131072, block_size=51072,
                                ratio=16)
        assert cfg.frame_in == 8192
        assert cfg.block_in == 3192
        assert cfg.halo_in == 5000
        assert cfg.overlap == 80000
        assert cfg.n_bins == 65537

    def test_invariant_rejection(self):
        with pytest.raises(ValueError, match="invariant"):
            OverlapSaveConfig(taps=100, fft_size=256, block_size=100, ratio=1)
        with pytest.raises(ValueError, match="power of two"):
            OverlapSaveConfig(taps=100, fft_size=300, block_size=201, ratio=1)
        with pytest.raises(ValueError, match="ratio"):
            OverlapSaveConfig(taps=97, fft_size=128, block_size=32, ratio=3)


class TestFraming:
    def test_frames_match_slices(self, rng):
        x = rng.normal(size=(3, 5 * 8 + 20)).astype(np.float32)
        frames = np.asarray(frame_input(jnp.asarray(x), block_in=8, halo_in=20))
        assert frames.shape == (3, 5, 28)
        for i in range(5):
            np.testing.assert_array_equal(frames[:, i], x[:, i * 8 : i * 8 + 28])

    def test_halo_larger_than_block(self, rng):
        # The production regime: halo (5000) > block_in (3192).
        x = rng.normal(size=(1, 4 * 3 + 10)).astype(np.float32)
        frames = np.asarray(frame_input(jnp.asarray(x), block_in=3, halo_in=10))
        for i in range(4):
            np.testing.assert_array_equal(frames[:, i], x[:, i * 3 : i * 3 + 13])

    def test_bad_length_rejected(self):
        with pytest.raises(ValueError, match="multiple"):
            frame_input(jnp.zeros((1, 25)), block_in=8, halo_in=2)


class TestZeroStuff:
    def test_positions(self):
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        out = np.asarray(zero_stuff(x, 4))
        expected = np.zeros(12)
        expected[[0, 4, 8]] = [1, 2, 3]
        np.testing.assert_array_equal(out[0], expected)

    def test_ratio_one_identity(self):
        x = jnp.asarray([1.0, 2.0])
        assert zero_stuff(x, 1) is x


class TestAgainstOracle:
    @pytest.mark.parametrize(
        "taps,fft,ratio",
        [(5, 64, 1), (9, 64, 2), (17, 64, 4), (33, 128, 8), (33, 128, 16),
         # m = 1024 = 32x32: exercises the split-layout folded 2x pipeline
         # (_split_folded_ok true) rather than the classic fallback.
         (257, 2048, 2)],
    )
    def test_matches_direct_convolution(self, rng, taps, fft, ratio):
        cfg = OverlapSaveConfig(taps=taps, fft_size=fft,
                                block_size=fft - (taps - 1), ratio=ratio)
        h = rng.normal(size=taps)
        spectrum = filter_spectrum(h, fft)
        x = rng.normal(size=(2, 5 * cfg.block_in)).astype(np.float32)
        xin = np.concatenate(
            [np.zeros((2, cfg.halo_in), np.float32), x], axis=-1
        )
        y = np.asarray(upsample_blocks(jnp.asarray(xin), spectrum, cfg))
        ref = np.stack([oracle_upsample(x[c], h, ratio) for c in range(2)])
        assert rel_err(y, ref) < 1e-5

    def test_impulse_response_recovery(self, rng):
        # An impulse through the convolver must reproduce the taps.
        taps = 13
        cfg = OverlapSaveConfig(taps=taps, fft_size=64, block_size=52, ratio=4)
        h = rng.normal(size=taps)
        spectrum = filter_spectrum(h, 64)
        x = np.zeros((1, cfg.block_in), np.float32)
        x[0, 0] = 1.0
        xin = np.concatenate([np.zeros((1, cfg.halo_in), np.float32), x], -1)
        y = np.asarray(upsample_blocks(jnp.asarray(xin), spectrum, cfg))[0]
        np.testing.assert_allclose(y[:taps], h, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(y[taps:], 0, atol=1e-5)

    def test_history_in_input_respected(self, rng):
        # Explicit nonzero halo must contribute exactly like earlier stream
        # content would.
        cfg = OverlapSaveConfig(taps=9, fft_size=32, block_size=24, ratio=2)
        h = rng.normal(size=9)
        spectrum = filter_spectrum(h, 32)
        full = rng.normal(size=2 * cfg.block_in + cfg.halo_in).astype(np.float32)
        y = np.asarray(
            upsample_blocks(jnp.asarray(full[None]), spectrum, cfg)
        )[0]
        ref_full = oracle_upsample(full, h, 2)
        # The op's output corresponds to input starting after the halo.
        ref = ref_full[cfg.halo_in * 2 :]
        assert rel_err(y, ref[: len(y)]) < 1e-5


class TestStreaming:
    def test_block_streaming_equals_single_shot(self, rng):
        cfg = OverlapSaveConfig(taps=17, fft_size=64, block_size=48, ratio=4)
        h = rng.normal(size=17)
        spectrum = filter_spectrum(h, 64)
        step = make_block_step(cfg)
        x = rng.normal(size=(2, 7 * cfg.block_in)).astype(np.float32)

        tail = jnp.zeros((2, cfg.halo_in), jnp.float32)
        chunks = []
        for i in range(7):
            y, tail = step(
                tail, jnp.asarray(x[:, i * cfg.block_in : (i + 1) * cfg.block_in]),
                spectrum,
            )
            chunks.append(np.asarray(y))
        streamed = np.concatenate(chunks, axis=-1)

        xin = np.concatenate([np.zeros((2, cfg.halo_in), np.float32), x], -1)
        single = np.asarray(upsample_blocks(jnp.asarray(xin), spectrum, cfg))
        np.testing.assert_allclose(streamed, single, rtol=1e-5, atol=1e-6)

    def test_multi_block_chunks(self, rng):
        # Feeding 2 blocks at a time must equal 1 block at a time.
        cfg = OverlapSaveConfig(taps=9, fft_size=32, block_size=24, ratio=2)
        h = rng.normal(size=9)
        spectrum = filter_spectrum(h, 32)
        step = make_block_step(cfg)
        x = rng.normal(size=(1, 4 * cfg.block_in)).astype(np.float32)

        tail = jnp.zeros((1, cfg.halo_in), jnp.float32)
        y2 = []
        for i in range(2):
            y, tail = step(
                tail,
                jnp.asarray(x[:, i * 2 * cfg.block_in : (i + 1) * 2 * cfg.block_in]),
                spectrum,
            )
            y2.append(np.asarray(y))
        ref = oracle_upsample(x[0], h, 2)
        assert rel_err(np.concatenate(y2, -1)[0], ref) < 1e-5


class TestAbsorbedInverse:
    """The tile-absorbed inverse (the batched-throughput hot path) vs the
    folded pipeline and the direct-convolution oracle.

    Small dispatches fall below _ABSORBED_MIN_FRAMES and production tap
    counts are slow on CPU, so this drives _upsample_frames_absorbed
    directly on a reduced two-stage geometry."""

    @pytest.mark.parametrize("inv_q2", [0, 32, 128])
    @pytest.mark.parametrize("form,stage2", [
        ("split", "stack"), ("split", "einsum"),
        ("stacked", "einsum"), ("stacked2", "einsum"),
    ])
    @pytest.mark.parametrize("taps,fft,ratio", [
        (1025, 8192, 4),
        (2001, 16384, 8),
        (4097, 16384, 16),
    ])
    def test_matches_oracle_and_folded(self, rng, taps, fft, ratio, form,
                                       stage2, inv_q2):
        """inv_q2 != 0 exercises the rebalanced splits (KernelTuning.inv_q2
        / TOTTON_INV_Q2) — q2=32 also breaks the forward P | Q2 coupling
        on these geometries, covering the non-split fallback branch."""
        from totton_tpu.ops.overlap_save import (
            KernelTuning,
            _absorbed_eligible,
            _upsample_frames_absorbed,
        )

        tuning = KernelTuning(form=form, stage2_interleave=stage2,
                              inv_q2=inv_q2)
        cfg = OverlapSaveConfig(taps=taps, fft_size=fft,
                                block_size=fft - (taps - 1), ratio=ratio)
        assert _absorbed_eligible(cfg, n_frames=64, tuning=tuning), (
            "geometry must exercise the absorbed path"
        )
        h = rng.normal(size=taps) * np.exp(-np.arange(taps) * 4.0 / taps)
        spectrum = filter_spectrum(h, fft)
        x = rng.normal(size=(2, 5 * cfg.block_in)).astype(np.float32)
        xin = np.concatenate(
            [np.zeros((2, cfg.halo_in), np.float32), x], axis=-1
        )
        frames = frame_input(jnp.asarray(xin), cfg.block_in, cfg.halo_in)
        y = np.asarray(
            _upsample_frames_absorbed(frames, spectrum, cfg, tuning))
        y = y.reshape(2, -1)
        ref = np.stack([oracle_upsample(x[c], h, ratio) for c in range(2)])
        assert rel_err(y, ref[:, : y.shape[-1]]) < 1e-4

    @pytest.mark.parametrize("fwd_p", [32, 64, 128, 96])
    def test_forward_split_override(self, rng, fwd_p):
        """KernelTuning.fwd_p pins the forward's two-stage split; an
        inapplicable value (96 doesn't divide m=2048 into two power-of-two
        stages... it doesn't divide at all) falls back to the default."""
        from totton_tpu.ops.overlap_save import (
            KernelTuning, _upsample_frames_absorbed,
        )

        taps, fft, ratio = 4097, 16384, 8
        tuning = KernelTuning(fwd_p=fwd_p)
        cfg = OverlapSaveConfig(taps=taps, fft_size=fft,
                                block_size=fft - (taps - 1), ratio=ratio)
        h = rng.normal(size=taps) * np.exp(-np.arange(taps) * 4.0 / taps)
        spectrum = filter_spectrum(h, fft)
        x = rng.normal(size=(2, 5 * cfg.block_in)).astype(np.float32)
        xin = np.concatenate(
            [np.zeros((2, cfg.halo_in), np.float32), x], axis=-1
        )
        frames = frame_input(jnp.asarray(xin), cfg.block_in, cfg.halo_in)
        y = np.asarray(
            _upsample_frames_absorbed(frames, spectrum, cfg, tuning))
        y = y.reshape(2, -1)
        ref = np.stack([oracle_upsample(x[c], h, ratio) for c in range(2)])
        assert rel_err(y, ref[:, : y.shape[-1]]) < 1e-4

    def test_tuning_validation(self):
        from totton_tpu.ops.overlap_save import KernelTuning

        with pytest.raises(ValueError, match="form"):
            KernelTuning(form="bogus")
        with pytest.raises(ValueError, match="stage2"):
            KernelTuning(stage2_interleave="bogus")

    def test_tuning_from_env(self, monkeypatch):
        from totton_tpu.ops.overlap_save import KernelTuning

        monkeypatch.setenv("TOTTON_ABSORBED_FORM", "stacked")
        monkeypatch.setenv("TOTTON_INV_Q2", "256")
        t = KernelTuning.from_env()
        assert t.form == "stacked" and t.inv_q2 == 256
        assert KernelTuning.from_env(inv_q2=0).inv_q2 == 0  # override wins

    def test_absorbed_guard_message(self, rng):
        """Direct callers on a single-stage inverse geometry get a clear
        error, not an opaque NoneType unpack (round-3 advisor finding)."""
        from totton_tpu.ops.overlap_save import _upsample_frames_absorbed

        cfg = OverlapSaveConfig(taps=129, fft_size=512, block_size=384,
                                ratio=4)
        spectrum = filter_spectrum(rng.normal(size=129), 512)
        frames = jnp.zeros((1, 2, cfg.frame_in), jnp.float32)
        with pytest.raises(ValueError, match="two-stage inverse"):
            _upsample_frames_absorbed(frames, spectrum, cfg)

    def test_production_split_resolution(self):
        """The K-curve rebalance rule resolves the production 16x inverse
        to (512, 128) and leaves ratios 4/8 balanced (PERF.md round 3);
        an override that violates the structural divisibilities falls
        back to the default split instead of breaking the algebra."""
        from totton_tpu.ops import overlap_save as osv

        h = 131072 // 2
        assert osv._inv_split(131072 // 16, h) == (512, 128)
        assert osv._inv_split(131072 // 8, h) == (256, 256)
        assert osv._inv_split(131072 // 4, h) == (256, 256)
        # 96 is not a divisor of h: falls back to the rebalanced default.
        assert osv._inv_split(131072 // 16, h, inv_q2=96) == (512, 128)

    def test_gate_respects_batch_and_ratio(self):
        from totton_tpu.ops.overlap_save import _absorbed_eligible

        prod = OverlapSaveConfig(taps=80001, fft_size=131072,
                                 block_size=51072, ratio=16)
        assert _absorbed_eligible(prod, n_frames=32)
        assert not _absorbed_eligible(prod, n_frames=8)  # small dispatch
        two_x = OverlapSaveConfig(taps=80001, fft_size=131072,
                                  block_size=51072, ratio=2)
        assert not _absorbed_eligible(two_x, n_frames=256)  # trivial tile


def test_production_geometries_use_split_forward():
    """All production ratios >= 4 satisfy the split-layout condition
    (two-stage forward with P | Q2), so the absorbed path never pays the
    forward inter-stage transpose."""
    from totton_tpu.ops import fft as _fft

    for ratio in (4, 8, 16):
        cfg = OverlapSaveConfig(taps=80001, fft_size=131072,
                                block_size=51072, ratio=ratio)
        m_factors = _fft._factorize(cfg.frame_in)
        _, q2 = _fft._factorize(cfg.fft_size // 2)
        assert len(m_factors) == 2
        assert q2 % m_factors[0] == 0
