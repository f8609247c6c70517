"""Output-validator tests: alignment, the three signal-metric gates
(correlation >= 0.7, spectral similarity >= 0.8, |RMS diff| <= 6 dB), and
failure detection for the classic corruption modes (reference contract:
scripts/test/validate_output.py:137-145)."""

import numpy as np
import pytest

from totton_tpu.testing.validate_output import (
    align_by_xcorr,
    validate_audio,
)


@pytest.fixture
def sine():
    t = np.arange(8192) / 44100.0
    return (0.5 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)


class TestAlignment:
    def test_zero_lag(self, sine):
        assert align_by_xcorr(sine, sine) == 0

    def test_positive_lag_detected(self, sine):
        delayed = np.concatenate([np.zeros(37, np.float32), sine])[: len(sine)]
        assert align_by_xcorr(sine, delayed) == 37

    def test_negative_lag_detected(self, sine):
        advanced = np.concatenate([sine[21:], np.zeros(21, np.float32)])
        assert align_by_xcorr(sine, advanced) == -21


class TestGates:
    def test_identical_passes(self, sine):
        r = validate_audio(sine, sine)
        assert r["passed"] and all(r["checks"].values())

    def test_upsampled_pair_passes(self, sine):
        # 2x zero-order-hold preserves the signal shape well enough for the
        # signal-metric gates (the validator decimates by the ratio).
        up = np.repeat(sine, 2)
        r = validate_audio(sine, up, output_ratio=2)
        assert r["passed"], r

    def test_gain_error_fails_rms_gate(self, sine):
        r = validate_audio(sine, sine * 4.0)  # +12 dB
        assert not r["checks"]["rms_diff_db"]
        assert not r["passed"]

    def test_uncorrelated_noise_fails(self, sine):
        rng = np.random.default_rng(0)
        noise = (rng.normal(size=len(sine)) * 0.5).astype(np.float32)
        r = validate_audio(sine, noise)
        assert not r["passed"]
        assert not r["checks"]["correlation"]

    def test_wrong_frequency_fails_spectral_gate(self, sine):
        t = np.arange(len(sine)) / 44100.0
        wrong = (0.5 * np.sin(2 * np.pi * 7901.0 * t)).astype(np.float32)
        r = validate_audio(sine, wrong)
        assert not r["passed"]

    def test_small_delay_still_passes(self, sine):
        # Alignment must absorb pipeline latency before the gates.
        delayed = np.concatenate([np.zeros(64, np.float32), sine])[: len(sine)]
        r = validate_audio(sine, delayed)
        assert r["passed"], r

    def test_metrics_reported(self, sine):
        r = validate_audio(sine, sine)
        for key in ("correlation", "spectral_similarity", "rms_diff_db",
                    "lag"):
            assert key in r, r
