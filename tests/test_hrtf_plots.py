"""HRTF crossfeed generator and plot tooling tests."""

import json

import numpy as np
import pytest

from totton_tpu.filters.hrtf import (
    CROSSFEED_TARGET_DC_GAIN_DB,
    HEAD_SIZES,
    HrirPair,
    SphericalHeadHrirSource,
    apply_exponential_tail_taper,
    apply_high_frequency_tilt,
    generate_all,
    generate_crossfeed_set,
    normalize_cross_dc_gain,
    resample_hrir,
    trim_hrir,
)


class TestProcessing:
    def test_resample_preserves_dc(self):
        h = np.zeros(256)
        h[10] = 1.0
        out = resample_hrir(h, 44100, 88200)
        # DC gain (sum) is preserved by resample_poly's kaiser filter.
        assert np.sum(out) == pytest.approx(np.sum(h), rel=0.02)

    def test_tail_taper_decays(self):
        fs = 44100
        h = np.ones(4410)  # 100 ms of ones
        out = apply_exponential_tail_taper(h, fs, start_ms=1.0, decay_ms=2.0)
        assert out[0] == 1.0
        # 50 ms after the start the envelope is ~e^-25.
        assert abs(out[fs // 20]) < 1e-9

    def test_hf_tilt_floor(self):
        fs = 705600
        rng = np.random.default_rng(0)
        h = rng.normal(size=2048)
        out = apply_high_frequency_tilt(h, fs, cutoff_hz=2500.0,
                                        min_gain_db=-18.0)
        spec_in = np.abs(np.fft.rfft(h, 1 << 14))
        spec_out = np.abs(np.fft.rfft(out, 1 << 14))
        freqs = np.fft.rfftfreq(1 << 14, 1.0 / fs)
        low = freqs < 2000
        high = freqs > 100000
        # Low band untouched, high band attenuated but not below the floor.
        assert np.median(spec_out[low] / spec_in[low]) == pytest.approx(1.0, abs=0.05)
        ratio_high = np.median(spec_out[high] / spec_in[high])
        assert 10 ** (-19 / 20) < ratio_high < 10 ** (-10 / 20)

    def test_trim(self):
        h = np.zeros(1000)
        h[5] = 1.0
        h[100] = 1e-6  # below -80 dB
        out = trim_hrir(h, -80.0, pad=4)
        assert len(out) < 100

    def test_dc_normalization(self):
        h = np.random.default_rng(1).uniform(0.1, 1.0, size=64)
        out, scale = normalize_cross_dc_gain(h)
        assert np.sum(out) == pytest.approx(10 ** (CROSSFEED_TARGET_DC_GAIN_DB / 20))


class TestGeneration:
    def test_spherical_source_itd(self):
        src = SphericalHeadHrirSource(HEAD_SIZES["M"])
        pair = src.load()
        assert pair.meta["itd_us"] > 200  # plausible contralateral ITD
        assert np.max(np.abs(pair.lr)) > 0

    def test_crossfeed_set_structure(self):
        pair = SphericalHeadHrirSource(HEAD_SIZES["M"]).load()
        channels, report = generate_crossfeed_set(pair, 705600)
        assert channels.shape[0] == 4
        # Direct paths are unity impulses.
        np.testing.assert_array_equal(channels[0], channels[3])
        assert channels[0][0] == 1.0
        assert np.all(channels[0][1:] == 0)
        # Cross paths are -10 dB at DC vs direct.
        assert np.sum(channels[1]) == pytest.approx(10 ** (-10 / 20), rel=1e-6)
        assert report["n_taps"] == channels.shape[1]

    def test_generate_all_exports(self, tmp_path):
        paths = generate_all(tmp_path, sizes=["M"], families=["44k"])
        assert len(paths) == 1
        meta = json.loads(open(paths[0]).read())
        assert meta["n_channels"] == 4
        assert meta["channels"] == ["LL", "LR", "RL", "RR"]
        data = np.fromfile(
            tmp_path / meta["coefficients_bin"], dtype="<f4"
        ).reshape(4, meta["taps_per_channel"])
        assert data.shape[1] == meta["taps_per_channel"]
        assert data[0][0] == 1.0


class TestPlots:
    def test_plot_filter_and_comparison(self, tmp_path):
        from totton_tpu.filters.design import FilterSpec, design_filter
        from totton_tpu.filters.plots import plot_filter, plot_phase_comparison

        spec = FilterSpec.from_multi_rate("44k_2x", n_taps=512)
        h_min, _ = design_filter(spec)
        spec_lin = FilterSpec.from_multi_rate("44k_2x", n_taps=512,
                                              phase="linear")
        h_lin, _ = design_filter(spec_lin)
        paths = plot_filter(h_min, spec.output_rate, spec.passband_end_hz,
                            spec.stopband_start_hz, tmp_path, "t512")
        assert len(paths) == 3
        cmp_path = plot_phase_comparison(h_min, h_lin, spec.output_rate,
                                         tmp_path)
        import os

        for p in paths + [cmp_path]:
            assert os.path.getsize(p) > 1000  # real PNG, not empty
