"""Unit tests for the web-layer EQ intake service (token-walk scanner,
requirement model, bounds, structured profile view).

The HTTP-level behavior is covered in test_web.py; these lock down the
scanner/validator internals directly.
"""

import pytest

from totton_tpu.web.services.eq import (
    is_correction_band,
    is_safe_profile_name,
    parse_eq_profile_content,
    sanitize_filename,
    scan_band_line,
    validate_eq_profile_content,
    validate_upload,
)


class TestScanner:
    def test_full_line(self):
        b = scan_band_line("Filter 3: ON PK Fc 1000 Hz Gain -3.5 dB Q 1.41")
        assert b.declared_num == 3 and b.enabled
        assert b.type_name == "PK" and b.fc_hz == 1000.0
        assert b.gain_db == -3.5 and b.q == 1.41

    def test_off_band(self):
        b = scan_band_line("Filter 1: OFF HPQ Fc 50 Hz Q 0.7")
        assert not b.enabled and b.type_name == "HPQ" and b.q == 0.7

    def test_multi_token_type(self):
        b = scan_band_line("Filter: ON LS 6DB Fc 105 Hz Gain 2 dB")
        assert b.type_name == "LS 6DB" and b.gain_db == 2.0
        assert b.declared_num is None

    def test_bw_oct(self):
        b = scan_band_line("Filter 2: ON PK Fc 250 Hz Gain 1 dB BW Oct 0.5")
        assert b.bw_oct == 0.5 and b.q is None
        assert b.effective_q() == pytest.approx(2.871, abs=1e-3)

    def test_bw_hz(self):
        b = scan_band_line("Filter 2: ON PK Fc 1000 Hz Gain 1 dB BW 500 Hz")
        assert b.bw_hz == 500.0
        assert b.effective_q() == pytest.approx(2.0)

    def test_glued_hz_and_khz(self):
        assert scan_band_line("Filter 1: ON PK Fc 1000Hz Gain 1 dB Q 1").fc_hz == 1000.0
        assert scan_band_line("Filter 1: ON PK Fc 2 kHz Gain 1 dB Q 1").fc_hz == 2000.0
        assert scan_band_line("Filter 1: ON PK Fc 2kHz Gain 1 dB Q 1").fc_hz == 2000.0

    def test_fc_units_agree_with_engine_parser(self):
        """The validator and the live DSP must see the SAME frequency for
        every accepted spelling (a 1000x disagreement means the plotted
        curve and the audible EQ diverge)."""
        from totton_tpu.eq.apo import parse_eq_string

        for line, want in [
            ("Filter 1: ON PK Fc 2 kHz Gain 1 dB Q 1", 2000.0),
            ("Filter 1: ON PK Fc 2kHz Gain 1 dB Q 1", 2000.0),
            ("Filter 1: ON PK Fc 250 Hz Gain 1 dB Q 1", 250.0),
        ]:
            assert scan_band_line(line).fc_hz == want
            assert parse_eq_string(line).bands[0].frequency == want

    def test_preamp_forms_agree_with_engine_parser(self):
        """_scan_preamp mirrors eq/apo.py _PREAMP_RE: dB suffix required
        (glued or spaced); a bare number is ignored by the engine so the
        validator must flag it, not report headroom."""
        from totton_tpu.eq.apo import parse_eq_string

        from totton_tpu.web.services.eq import _scan_preamp

        assert _scan_preamp("Preamp: -6 dB") == (True, -6.0)
        assert _scan_preamp("Preamp: -6dB") == (True, -6.0)
        assert parse_eq_string("Preamp: -6dB").preamp_db == -6.0
        # Bare number: engine applies preamp 0 -> validator says unreadable.
        assert _scan_preamp("Preamp: -6") == (True, None)
        assert parse_eq_string("Preamp: -6").preamp_db == 0.0
        # Trailing junk: engine ignores the line -> unreadable here too.
        assert _scan_preamp("Preamp: -6 dB extra") == (True, None)

    def test_rejects_non_filter_shapes(self):
        assert scan_band_line("Preamp: -6 dB") is None
        assert scan_band_line("Filter 1: MAYBE PK Fc 100 Hz") is None
        assert scan_band_line("Filter 1: ON PK") is None  # no Fc
        assert scan_band_line("Filter 1: ON PK Fc abc Hz") is None


class TestValidation:
    def test_missing_preamp_is_error(self):
        r = validate_eq_profile_content("Filter 1: ON PK Fc 100 Hz Gain 1 dB Q 1")
        assert not r["valid"]
        assert any("Preamp" in e for e in r["errors"])

    def test_requirement_model(self):
        # PK without width -> error; LP without anything -> fine.
        r = validate_eq_profile_content(
            "Preamp: -2 dB\n"
            "Filter 1: ON PK Fc 100 Hz Gain 1 dB\n"
            "Filter 2: ON LP Fc 8000 Hz\n"
        )
        assert len(r["errors"]) == 1 and "width" in r["errors"][0]
        assert r["filter_count"] == 2

    def test_gain_required_for_shelves(self):
        r = validate_eq_profile_content(
            "Preamp: 0 dB\nFilter 1: ON LSC Fc 100 Hz\n")
        assert any("Gain" in e for e in r["errors"])

    def test_bounds(self):
        r = validate_eq_profile_content(
            "Preamp: -200 dB\n"
            "Filter 1: ON PK Fc 5 Hz Gain 50 dB Q 500\n"
        )
        assert len(r["errors"]) == 4  # preamp, fc, gain, q all out of range

    def test_clip_recommendation(self):
        r = validate_eq_profile_content(
            "Preamp: 0 dB\n"
            "Filter 1: ON PK Fc 100 Hz Gain 4 dB Q 1\n"
            "Filter 2: OFF PK Fc 200 Hz Gain 9 dB Q 1\n"  # disabled: ignored
        )
        assert r["valid"]
        assert r["recommended_preamp_db"] == -4.0
        assert any("clip" in w for w in r["warnings"])

    def test_unknown_type_warns_not_errors(self):
        r = validate_eq_profile_content(
            "Preamp: 0 dB\nFilter 1: ON XYZ Fc 100 Hz\n")
        assert r["valid"]
        assert any("unrecognized" in w for w in r["warnings"])

    def test_unreadable_filter_line_warns(self):
        r = validate_eq_profile_content(
            "Preamp: 0 dB\nFilter 1: garbage here\n")
        assert r["filter_count"] == 1
        assert any("unreadable filter line" in w for w in r["warnings"])

    def test_empty(self):
        r = validate_eq_profile_content("  \n ")
        assert not r["valid"] and r["filter_count"] == 0

    def test_filter_count_cap(self):
        lines = ["Preamp: 0 dB"] + [
            f"Filter {i}: ON PK Fc 100 Hz Gain 1 dB Q 1" for i in range(120)
        ]
        r = validate_eq_profile_content("\n".join(lines))
        assert not r["valid"]
        assert any("at most" in e for e in r["errors"])


class TestNameSafety:
    def test_safe_names(self):
        assert is_safe_profile_name("my_eq-1.2")
        assert not is_safe_profile_name("../etc/passwd")
        assert not is_safe_profile_name(".hidden")

    def test_sanitize(self):
        assert sanitize_filename("dir/sub\\evil.txt") == "evil.txt"
        assert sanitize_filename("a..b.txt") is None
        assert sanitize_filename("ok-1_2.txt") == "ok-1_2.txt"


class TestUpload:
    def test_rejects_non_txt(self):
        with pytest.raises(ValueError):
            validate_upload("x.exe", b"Preamp: 0 dB")

    def test_rejects_non_utf8(self):
        with pytest.raises(ValueError):
            validate_upload("x.txt", b"\xff\xfe\x00bad")

    def test_report_has_size(self):
        content = b"Preamp: -1 dB\nFilter 1: ON PK Fc 100 Hz Gain 1 dB Q 1\n"
        text, safe, report = validate_upload("p.txt", content)
        assert safe == "p.txt" and report["valid"]
        assert report["size_bytes"] == len(content)


class TestStructuredView:
    def test_opra_with_modern_target(self, tmp_path):
        f = tmp_path / "p.txt"
        f.write_text(
            "# OPRA: Maker Model\n"
            "# Author: Someone\n"
            "# License: CC BY-SA 4.0\n"
            "# Details: oratory1990 preset + Modern Target (KB5000_7)\n"
            "Preamp: -9.2 dB\n"
            "Filter 1: ON PK Fc 100 Hz Gain 2 dB Q 1.0\n"
            "Filter 2: ON PK Fc 5366 Hz Gain 2.8 dB Q 1.5\n"
        )
        view = parse_eq_profile_content(f)
        assert view["source_type"] == "opra"
        assert view["has_modern_target"]
        assert view["opra_info"]["product"] == "Maker Model"
        assert view["opra_info"]["license"] == "CC BY-SA 4.0"
        assert len(view["original_filters"]) == 1
        assert "5366" in view["original_filters"][0]
        # Preamp + the non-correction band stay in opra_filters.
        assert len(view["opra_filters"]) == 2

    def test_custom_profile(self, tmp_path):
        f = tmp_path / "c.txt"
        f.write_text("Preamp: 0 dB\nFilter 1: ON PK Fc 100 Hz Gain 1 dB Q 1\n")
        view = parse_eq_profile_content(f)
        assert view["source_type"] == "custom"
        assert not view["has_modern_target"]
        assert view["opra_info"] is None
        assert len(view["opra_filters"]) == 2

    def test_missing_file(self, tmp_path):
        assert "error" in parse_eq_profile_content(tmp_path / "nope.txt")


def test_correction_band_detection():
    band = scan_band_line("Filter 9: ON PK Fc 5366 Hz Gain 2.8 dB Q 1.5")
    assert is_correction_band(band)
    other = scan_band_line("Filter 9: ON PK Fc 5366 Hz Gain -9 dB Q 1.5")
    assert not is_correction_band(other)
    assert not is_correction_band(None)
