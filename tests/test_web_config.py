"""Config service tests: camelCase schema, legacy-key migration, EQ profile
inference (reference: web/services/config.py semantics)."""

import json

import pytest

from totton_tpu.web.services.config import (
    AlsaSettings,
    FilterSettings,
    Settings,
    load_config,
    save_config,
)


@pytest.fixture
def cfg_path(tmp_path, monkeypatch):
    path = tmp_path / "config.json"
    monkeypatch.setenv("TOTTON_CONFIG_PATH", str(path))
    monkeypatch.setenv("TOTTON_EQ_DIR", str(tmp_path / "EQ"))
    return path


def test_missing_file_defaults(cfg_path):
    s = load_config()
    assert not s.eq_enabled and s.alsa is None and s.filter is None


def test_round_trip(cfg_path, tmp_path):
    profile = tmp_path / "EQ" / "p.txt"
    profile.parent.mkdir()
    profile.write_text("Preamp: -1 dB")
    s = Settings(
        eq_enabled=True,
        eq_profile="p",
        eq_profile_path=str(profile),
        alsa=AlsaSettings(input_device="null", output_device="null",
                          sample_rate=44100, channels=2, format="S32_LE",
                          period_frames=4096, buffer_frames=16384),
        filter=FilterSettings(ratio=16, phase_type="minimum",
                              directory="data/coefficients"),
    )
    assert save_config(s)
    raw = json.loads(cfg_path.read_text())
    assert raw["eqEnabled"] is True
    assert raw["alsa"]["sampleRate"] == 44100
    assert raw["filter"]["phaseType"] == "minimum"

    back = load_config()
    assert back.eq_enabled and back.eq_profile == "p"
    assert back.alsa.sample_rate == 44100
    assert back.filter.ratio == 16


def test_legacy_key_migration(cfg_path):
    cfg_path.write_text(json.dumps({
        "alsaInputDevice": "hw:0,0",
        "alsaSampleRate": 48000,
        "alsaFormat": "S24_3LE",
    }))
    s = load_config()
    assert s.alsa.input_device == "hw:0,0"
    assert s.alsa.sample_rate == 48000

    # Saving strips the legacy keys and writes the nested block.
    s.alsa.channels = 2
    save_config(s)
    raw = json.loads(cfg_path.read_text())
    assert "alsaInputDevice" not in raw
    assert raw["alsa"]["inputDevice"] == "hw:0,0"


def test_eq_profile_path_inferred_from_name(cfg_path, tmp_path):
    cfg_path.write_text(json.dumps({"eqProfile": "myeq"}))
    s = load_config()
    assert s.eq_profile_path.endswith("EQ/myeq.txt")
    assert s.eq_enabled  # enabled because a path was derivable


def test_eq_disabled_when_no_path(cfg_path):
    cfg_path.write_text(json.dumps({"eqEnabled": True}))
    s = load_config()
    assert not s.eq_enabled  # enabled flag without a profile is meaningless


def test_save_preserves_unknown_fields(cfg_path):
    cfg_path.write_text(json.dumps({"customField": 42}))
    save_config(Settings())
    raw = json.loads(cfg_path.read_text())
    assert raw["customField"] == 42


def test_dither_round_trip(cfg_path):
    from totton_tpu.web.services.config import AlsaSettings

    save_config(Settings(alsa=AlsaSettings(format="S16_LE", dither=True)))
    s = load_config()
    assert s.alsa.dither is True
    raw = json.loads(cfg_path.read_text())
    assert raw["alsa"]["dither"] is True
