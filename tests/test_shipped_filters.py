"""Shipped filter bank integrity (data/coefficients).

Mirrors the reference's bundled-coefficient tests
(tests/python/test_generate_filter.py: bundled-coefficient integrity):
all 16 artifacts exist, geometry and DC gain are correct, json <-> bin
consistent, phases share geometry (hot-swap requirement).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from totton_tpu.filters.design import MULTI_RATE_SPECS
from totton_tpu.filters.sidecar import load_filter

BANK = Path(__file__).parent.parent / "data" / "coefficients"

pytestmark = pytest.mark.skipif(
    not BANK.is_dir(), reason="shipped filter bank missing"
)


def _expected_names():
    for key in MULTI_RATE_SPECS:
        family, ratio = key.split("_")
        for phase in ("min", "linear"):
            yield f"filter_{family}_{ratio}_80000_{phase}_phase", key, phase


def test_all_sixteen_artifacts_exist():
    for base, _, _ in _expected_names():
        assert (BANK / f"{base}.json").is_file(), base
        assert (BANK / f"{base}.bin").is_file(), base


@pytest.mark.parametrize("base,key,phase", list(_expected_names()))
def test_artifact_integrity(base, key, phase):
    lf = load_filter(BANK / f"{base}.json")
    spec = MULTI_RATE_SPECS[key]
    meta = json.loads((BANK / f"{base}.json").read_text())

    # Geometry identical across the whole bank (phase hot-swap requires it).
    assert lf.sidecar.taps == 80001
    assert lf.sidecar.fft_size == 131072
    assert lf.sidecar.block_size == 51072
    assert lf.ratio == spec["ratio"]
    assert meta["sample_rate_input"] == spec["input_rate"]

    # DC gain = ratio * 0.99 within float32 rounding.
    assert np.isclose(lf.taps.sum(), spec["ratio"] * 0.99, rtol=1e-4)

    # bin <-> json consistency.
    assert len(lf.taps) == lf.sidecar.taps

    # Design quality as recorded at generation time.
    v = meta["validation_results"]
    assert v["meets_stopband_spec"]
    assert v["stopband_attenuation_db"] > 200.0
    if phase == "min":
        assert v["is_minimum_phase"]
    else:
        assert v["is_symmetric"]


def test_selector_resolves_bank():
    from totton_tpu.engine.selector import resolve_filter_path

    for rate, ratio, phase, expect in [
        (44100, 16, "min", "filter_44k_16x_80000_min_phase.json"),
        (48000, 16, "linear", "filter_48k_16x_80000_linear_phase.json"),
        (352800, 2, "minimum", "filter_44k_2x_80000_min_phase.json"),
    ]:
        p = resolve_filter_path(filter_dir=str(BANK), phase=phase,
                                ratio=ratio, input_rate=rate)
        assert p.endswith(expect)


# -- low-latency bank (8000 taps, fft 16384) --------------------------------
#
# The production 80k bank carries block_in = 3192 frames of accumulation
# latency at 16x/44.1k (>= 72 ms) — a live-monitoring non-starter. The 8k
# bank trades taps for latency: block_in = 524 frames (~11.9 ms) while the
# measured stopband still clears 200 dB (the design transition at these
# geometries needs ~3.2k taps for 140 dB, so 8k has headroom).


def _lowlat_names():
    for key in MULTI_RATE_SPECS:
        family, ratio = key.split("_")
        for phase in ("min", "linear"):
            yield f"filter_{family}_{ratio}_8000_{phase}_phase", key, phase


def test_low_latency_bank_exists():
    for base, _, _ in _lowlat_names():
        assert (BANK / f"{base}.json").is_file(), base
        assert (BANK / f"{base}.bin").is_file(), base


@pytest.mark.parametrize("base,key,phase", list(_lowlat_names()))
def test_low_latency_artifact_integrity(base, key, phase):
    lf = load_filter(BANK / f"{base}.json")
    spec = MULTI_RATE_SPECS[key]
    meta = json.loads((BANK / f"{base}.json").read_text())

    assert lf.sidecar.taps == 8001
    assert lf.sidecar.fft_size == 16384
    assert lf.sidecar.block_size == 8384
    assert lf.ratio == spec["ratio"]
    assert lf.sidecar.block_size % spec["ratio"] == 0
    assert np.isclose(lf.taps.sum(), spec["ratio"] * 0.99, rtol=1e-4)
    assert len(lf.taps) == lf.sidecar.taps

    v = meta["validation_results"]
    assert v["meets_stopband_spec"]
    assert v["stopband_attenuation_db"] > 200.0
    if phase == "min":
        # The reference's is_minimum_phase proxy gates the peak at the
        # first 1% OF TAPS — a tap-count-relative threshold. The 16x
        # bank's physical peak sits at ~114 output samples (0.16 ms at
        # 705.6 kHz), identical to the 80k bank's ~126 that passes at
        # 800; assert the physics directly for the short bank.
        assert v["energy_ratio_first_to_second_half"] > 10.0
        out_rate = meta["sample_rate_output"]
        assert v["peak_position"] / out_rate < 1e-3, v["peak_position"]
    else:
        assert v["is_symmetric"]


def test_low_latency_selector_picks_8k():
    from totton_tpu.engine.selector import resolve_filter_path

    p = resolve_filter_path(filter_dir=str(BANK), phase="min", ratio=16,
                            input_rate=44100, latency="low")
    assert p.endswith("filter_44k_16x_8000_min_phase.json")
    # Default (normal) still picks the 80k bank.
    p = resolve_filter_path(filter_dir=str(BANK), phase="min", ratio=16,
                            input_rate=44100)
    assert p.endswith("filter_44k_16x_80000_min_phase.json")


def test_low_latency_block_accumulation_budget():
    """The latency the mode exists for: block accumulation at 16x/44.1k
    drops from >= 72 ms (80k bank) to under 12 ms."""
    lf = load_filter(BANK / "filter_44k_16x_8000_min_phase.json")
    block_in = lf.sidecar.block_size // lf.ratio
    assert block_in == 524
    assert block_in / 44100 < 0.012
    lf80 = load_filter(BANK / "filter_44k_16x_80000_min_phase.json")
    assert (lf80.sidecar.block_size // lf80.ratio) / 44100 > 0.072
