"""Filter design toolkit tests.

Modeled on the reference's tests/python/test_generate_filter.py strategy:
config invariants, DC-gain normalization, frequency-response assertions,
minimum-phase property checks, sidecar round-trip integrity.
"""

import json
import math

import numpy as np
import pytest

from totton_tpu.filters.design import (
    MULTI_RATE_SPECS,
    FilterSpec,
    aligned_tap_count,
    calculate_safe_gain,
    design_filter,
    design_kaiser_lowpass,
    minimum_phase_homomorphic,
    normalize_dc_gain,
)
from totton_tpu.filters.sidecar import (
    FilterSidecar,
    load_filter,
    overlap_save_geometry,
    save_filter,
)
from totton_tpu.filters.validate import validate_filter


class TestAlignedTapCount:
    def test_already_aligned(self):
        assert aligned_tap_count(80001, 16) == 80001
        assert aligned_tap_count(80001, 2) == 80001

    def test_pads_up(self):
        assert aligned_tap_count(80000, 16) == 80001
        assert aligned_tap_count(80000, 2) == 80001
        assert aligned_tap_count(10, 4) == 13

    def test_ratio_one(self):
        assert aligned_tap_count(12345, 1) == 12345


class TestFilterSpec:
    def test_multi_rate_table(self):
        # 8 rungs; each rung's input rate x ratio lands on the family target.
        assert len(MULTI_RATE_SPECS) == 8
        for key, cfg in MULTI_RATE_SPECS.items():
            spec = FilterSpec.from_multi_rate(key)
            target = 705600 if key.startswith("44k") else 768000
            assert spec.output_rate == target
            assert spec.family == ("44k" if key.startswith("44k") else "48k")
            assert cfg["stopband"] == cfg["input_rate"] // 2

    def test_invariant_passband_above_input_nyquist(self):
        with pytest.raises(ValueError, match="Nyquist"):
            FilterSpec(
                n_taps=1000, input_rate=44100, upsample_ratio=16,
                stopband_start_hz=22050, passband_end_hz=30000,
            )

    def test_invariant_stopband_above_output_nyquist(self):
        with pytest.raises(ValueError, match="Nyquist"):
            FilterSpec(
                n_taps=1000, input_rate=44100, upsample_ratio=2,
                stopband_start_hz=50000,
            )

    def test_invariant_bad_ratio(self):
        with pytest.raises(ValueError, match="upsample_ratio"):
            FilterSpec(
                n_taps=1000, input_rate=44100, upsample_ratio=3,
                stopband_start_hz=22050,
            )

    def test_basename_convention(self):
        spec = FilterSpec.from_multi_rate("44k_16x", n_taps=80000)
        assert spec.basename() == "filter_44k_16x_80000_min_phase"
        spec_lin = FilterSpec.from_multi_rate("48k_2x", n_taps=80000, phase="linear")
        assert spec_lin.basename() == "filter_48k_2x_80000_linear_phase"


class TestNormalization:
    def test_dc_gain_normalized(self):
        h = np.random.default_rng(1).normal(size=501)
        out, report = normalize_dc_gain(h, target_dc_gain=4.0)
        assert np.isclose(np.sum(out), 4.0 * 0.99)
        assert report["normalization_applied"]
        assert np.isclose(report["applied_scale"] * np.sum(h), 4.0 * 0.99)

    def test_zero_dc_rejected(self):
        h = np.array([1.0, -1.0])
        with pytest.raises(ValueError):
            normalize_dc_gain(h, 2.0)


class TestMinimumPhase:
    def test_magnitude_preserved(self):
        spec = FilterSpec.from_multi_rate("44k_2x", n_taps=1000)
        h_lin = design_kaiser_lowpass(spec)
        h_min = minimum_phase_homomorphic(h_lin)
        n_fft = 1 << 15
        mag_lin = np.abs(np.fft.rfft(h_lin, n_fft))
        mag_min = np.abs(np.fft.rfft(h_min, n_fft))
        # Magnitude match in the passband + transition (where |H| is not tiny)
        mask = mag_lin > 1e-8
        assert np.allclose(mag_min[mask], mag_lin[mask], rtol=1e-3, atol=1e-9)

    def test_energy_front_loaded(self):
        spec = FilterSpec.from_multi_rate("44k_2x", n_taps=2000)
        h, _ = design_filter(spec)
        n = len(h)
        front = np.sum(h[: n // 2] ** 2)
        back = np.sum(h[n // 2 :] ** 2)
        assert front > 1e6 * max(back, 1e-300)

    def test_no_preringing(self):
        # Peak must sit near the start, unlike the linear-phase center peak.
        spec = FilterSpec.from_multi_rate("44k_2x", n_taps=2000)
        h, _ = design_filter(spec)
        assert np.argmax(np.abs(h)) < len(h) // 20


class TestFrequencyResponse:
    @pytest.mark.parametrize("key,taps", [("44k_2x", 2000), ("48k_2x", 2000)])
    def test_meets_stopband_spec_and_flat_passband(self, key, taps):
        spec = FilterSpec.from_multi_rate(key, n_taps=taps)
        h, _ = design_filter(spec)
        v = validate_filter(
            h, spec.output_rate, spec.passband_end_hz, spec.stopband_start_hz,
            140.0, spec.target_dc_gain,
        )
        assert v["meets_stopband_spec"], v
        assert v["stopband_attenuation_db"] > 140.0
        assert v["passband_ripple_db"] < 1e-3

    def test_linear_phase_symmetric(self):
        spec = FilterSpec.from_multi_rate("44k_2x", n_taps=1000, phase="linear")
        h, _ = design_filter(spec)
        v = validate_filter(
            h, spec.output_rate, spec.passband_end_hz, spec.stopband_start_hz,
            140.0, phase="linear",
        )
        # firwin output is symmetric; alignment padding may add trailing zeros.
        nz = np.flatnonzero(np.abs(h) > 0)
        core = h[nz[0] : nz[-1] + 1]
        assert np.allclose(core, core[::-1], atol=1e-15)


class TestSidecar:
    def test_geometry_matches_reference_bundled(self):
        # The 80001-tap bundled filters use fft 131072 / block 51072.
        fft, block = overlap_save_geometry(80001)
        assert (fft, block) == (131072, 51072)
        assert fft - block == 80000

    def test_geometry_override(self):
        fft, block = overlap_save_geometry(80001, fft_size=262144)
        assert block == 262144 - 80000

    def test_invariant_checks(self):
        with pytest.raises(ValueError, match="power of two"):
            FilterSidecar("x.bin", taps=100, fft_size=300, block_size=201,
                          upsample_factor=1)
        with pytest.raises(ValueError, match="invariant"):
            FilterSidecar("x.bin", taps=100, fft_size=256, block_size=100,
                          upsample_factor=1)
        with pytest.raises(ValueError, match="divisible"):
            FilterSidecar("x.bin", taps=98, fft_size=256, block_size=159,
                          upsample_factor=2)

    def test_round_trip(self, tmp_path):
        h = np.random.default_rng(2).normal(size=1025).astype(np.float32)
        path = save_filter(h, tmp_path, "rt_test", upsample_factor=4,
                           metadata={"sample_rate_input": 176400})
        lf = load_filter(path)
        assert np.array_equal(lf.taps, h)
        assert lf.ratio == 4
        assert lf.sidecar.fft_size == 2048
        assert lf.sidecar.block_size == 2048 - 1024
        assert lf.sidecar.block_input_frames == 1024 // 4

    def test_bin_size_mismatch_rejected(self, tmp_path):
        h = np.zeros(1025, dtype=np.float32)
        path = save_filter(h, tmp_path, "bad_bin", upsample_factor=1)
        with open(path) as f:
            payload = json.load(f)
        bin_path = tmp_path / payload["coefficients_bin"]
        bin_path.write_bytes(bin_path.read_bytes()[:-4])
        with pytest.raises(ValueError, match="mismatch"):
            load_filter(path)


class TestGeneratedArtifacts:
    def test_session_fixtures_valid(self, coefficients_dir):
        files = sorted(coefficients_dir.glob("*.json"))
        assert len(files) == 3
        for jf in files:
            lf = load_filter(jf)
            sc = lf.sidecar
            assert sc.fft_size - sc.block_size == sc.taps - 1
            assert (sc.taps - 1) % sc.upsample_factor == 0
            # DC gain == ratio * 0.99 within float32 rounding
            assert np.isclose(lf.taps.sum(), sc.upsample_factor * 0.99,
                              rtol=1e-5)
            meta = json.loads(jf.read_text())
            assert meta["validation_results"]["meets_stopband_spec"]

    def test_safe_gain(self):
        sets = {"a": np.array([0.5, 0.25]), "b": np.array([0.8, -0.1])}
        sg = calculate_safe_gain(sets)
        assert np.isclose(sg["recommended_max_gain_linear"], 1.25)
        assert sg["recommended_max_gain_db"] == pytest.approx(
            20 * math.log10(1.25))
