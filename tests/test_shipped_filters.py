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
