"""EQ profile file handling: safety checks, validation, structured parsing.

Parity with the reference's web/services/eq.py: path-traversal-safe names,
per-type required-parameter validation with range bounds, clipping-headroom
recommendation, and OPRA / Modern-Target-aware profile parsing.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

from totton_tpu.integration.modern_target import MODERN_TARGET_SPEC
from totton_tpu.web.constants import (
    FREQ_MAX_HZ,
    FREQ_MIN_HZ,
    GAIN_MAX_DB,
    GAIN_MIN_DB,
    MAX_EQ_FILE_SIZE,
    MAX_EQ_FILTERS,
    PREAMP_MAX_DB,
    PREAMP_MIN_DB,
    Q_MAX,
    Q_MIN,
    SAFE_FILENAME_PATTERN,
    SAFE_PROFILE_NAME_PATTERN,
)

#: Which parameters each filter type requires (fc always required).
FILTER_TYPE_PARAMS: dict[str, dict[str, bool]] = {
    "PK": {"gain": True, "q": True},
    "MODAL": {"gain": True, "q": True},
    "PEQ": {"gain": True, "q": True},
    "LP": {"gain": False, "q": False},
    "LPQ": {"gain": False, "q": False},
    "HP": {"gain": False, "q": False},
    "HPQ": {"gain": False, "q": False},
    "BP": {"gain": False, "q": False},
    "NO": {"gain": False, "q": False},
    "AP": {"gain": True, "q": True},
    "LS": {"gain": True, "q": True},
    "HS": {"gain": True, "q": True},
    "LSC": {"gain": True, "q": False},
    "HSC": {"gain": True, "q": False},
    "LSQ": {"gain": True, "q": True},
    "HSQ": {"gain": True, "q": True},
    "LS 6DB": {"gain": True, "q": False},
    "LS 12DB": {"gain": True, "q": False},
    "HS 6DB": {"gain": True, "q": False},
    "HS 12DB": {"gain": True, "q": False},
}


def is_safe_profile_name(name: str | None) -> bool:
    if not name:
        return True
    if not SAFE_PROFILE_NAME_PATTERN.match(name):
        return False
    return ".." not in name and not name.startswith(".")


def sanitize_filename(filename: str) -> str | None:
    if not filename:
        return None
    basename = filename.replace("\\", "/").split("/")[-1]
    if not SAFE_FILENAME_PATTERN.match(basename) or ".." in basename:
        return None
    return basename


_FILTER_LINE = re.compile(
    r"Filter\s*(\d+)?\s*:\s+(ON|OFF)\s+(.+?)\s+Fc\s+([\d.]+)\s*(?:Hz)?",
    re.IGNORECASE,
)


def parse_filter_line(line: str) -> dict[str, Any] | None:
    m = _FILTER_LINE.match(line)
    if not m:
        return None
    result: dict[str, Any] = {
        "filter_num": int(m.group(1)) if m.group(1) else None,
        "enabled": m.group(2).upper() == "ON",
        "filter_type": " ".join(m.group(3).upper().split()),
        "frequency": float(m.group(4)),
        "gain": None, "q": None, "bw": None, "oct": None,
    }
    rest = line[m.end():]
    gm = re.search(r"Gain\s+([-+]?\d+\.?\d*)\s*dB", rest, re.IGNORECASE)
    if gm:
        result["gain"] = float(gm.group(1))
    qm = re.search(r"\bQ\s+([\d.]+)", rest, re.IGNORECASE)
    if qm:
        result["q"] = float(qm.group(1))
    om = re.search(r"BW\s+oct\s+([\d.]+)", rest, re.IGNORECASE)
    if om:
        result["oct"] = float(om.group(1))
    else:
        bm = re.search(r"BW\s+([\d.]+)\s*(?:Hz)?", rest, re.IGNORECASE)
        if bm:
            result["bw"] = float(bm.group(1))
    return result


def is_modern_target_filter(parsed: dict | None) -> bool:
    """Does a parsed filter line match a KB5000_7 correction band?"""
    if not parsed or parsed.get("gain") is None or parsed.get("q") is None:
        return False
    if parsed.get("filter_type") != "PK":
        return False
    return MODERN_TARGET_SPEC.matches_any(
        parsed["frequency"], parsed["gain"], parsed["q"]
    )


def validate_eq_profile_content(content: str) -> dict[str, Any]:
    """Validate APO text: required Preamp, per-type params, range bounds,
    filter-count cap, clipping-headroom recommendation."""
    errors: list[str] = []
    warnings: list[str] = []
    preamp_db: float | None = None
    filter_count = 0
    max_positive_gain = 0.0
    recommended_preamp_db = 0.0

    if not content or not content.strip():
        return {
            "valid": False, "errors": ["Empty file"], "warnings": [],
            "preamp_db": None, "filter_count": 0,
            "recommended_preamp_db": 0.0,
        }

    lines = content.strip().split("\n")
    preamp_found = False
    for line in lines:
        stripped = line.strip()
        if stripped.startswith("Preamp:"):
            preamp_found = True
            m = re.search(r"Preamp:\s*([-+]?\d+\.?\d*)\s*[dD][bB]?", stripped)
            if m:
                preamp_db = float(m.group(1))
                if not PREAMP_MIN_DB <= preamp_db <= PREAMP_MAX_DB:
                    errors.append(
                        f"Preamp {preamp_db}dB out of range "
                        f"({PREAMP_MIN_DB}dB to {PREAMP_MAX_DB}dB)"
                    )
            else:
                warnings.append(f"Could not parse Preamp value: {stripped}")
            break
    if not preamp_found:
        errors.append("Missing 'Preamp:' line")

    for line in lines:
        stripped = line.strip()
        lower = stripped.lower()
        if not stripped or stripped.startswith("#") or lower.startswith("preamp:"):
            continue
        if not (lower.startswith("filter ") or lower.startswith("filter:")):
            continue
        filter_count += 1
        parsed = parse_filter_line(stripped)
        if not parsed:
            shown = stripped[:50] + "..." if len(stripped) > 50 else stripped
            warnings.append(f"Could not parse filter line: {shown}")
            continue
        label = parsed["filter_num"] or filter_count
        ftype = parsed["filter_type"]
        params = FILTER_TYPE_PARAMS.get(ftype)
        if params is None:
            warnings.append(f"Filter {label}: Unknown type '{ftype}'")
        else:
            if params["gain"] and parsed["gain"] is None:
                errors.append(
                    f"Filter {label}: Type '{ftype}' requires Gain parameter"
                )
            if (params["q"] and parsed["q"] is None
                    and parsed["bw"] is None and parsed["oct"] is None):
                errors.append(
                    f"Filter {label}: Type '{ftype}' requires Q (or BW/Oct) "
                    "parameter"
                )
        freq = parsed["frequency"]
        if not FREQ_MIN_HZ <= freq <= FREQ_MAX_HZ:
            errors.append(
                f"Filter {label}: Frequency {freq}Hz out of range "
                f"({FREQ_MIN_HZ}Hz to {FREQ_MAX_HZ}Hz)"
            )
        gain = parsed["gain"]
        if gain is not None:
            if not GAIN_MIN_DB <= gain <= GAIN_MAX_DB:
                errors.append(
                    f"Filter {label}: Gain {gain}dB out of range "
                    f"({GAIN_MIN_DB}dB to {GAIN_MAX_DB}dB)"
                )
            elif parsed["enabled"] and gain > max_positive_gain:
                max_positive_gain = gain
        q = parsed["q"]
        if q is not None and not Q_MIN <= q <= Q_MAX:
            errors.append(
                f"Filter {label}: Q {q} out of range ({Q_MIN} to {Q_MAX})"
            )

    if filter_count > MAX_EQ_FILTERS:
        errors.append(
            f"Too many filters ({filter_count}). Maximum allowed: "
            f"{MAX_EQ_FILTERS}"
        )
    if filter_count == 0 and preamp_found:
        warnings.append("No filter lines found (only Preamp)")

    if max_positive_gain > 0:
        recommended_preamp_db = -max_positive_gain
        if preamp_db is not None and preamp_db > recommended_preamp_db:
            warnings.append(
                f"Preamp {preamp_db}dB may clip (max boost "
                f"+{max_positive_gain}dB). Recommended Preamp: "
                f"{recommended_preamp_db}dB or lower."
            )

    return {
        "valid": not errors,
        "errors": errors,
        "warnings": warnings,
        "preamp_db": preamp_db,
        "filter_count": filter_count,
        "recommended_preamp_db": recommended_preamp_db,
    }


def validate_upload(filename: str, content_bytes: bytes) -> tuple[str, str, dict]:
    """Validate an uploaded profile. Returns (content, safe_name, report);
    raises ValueError with a user-facing message on rejection."""
    if not filename or not filename.endswith(".txt"):
        raise ValueError("Only .txt files are supported")
    safe = sanitize_filename(filename)
    if not safe:
        raise ValueError(
            "Invalid filename. Use only letters, numbers, underscores, "
            "hyphens, and dots."
        )
    if len(content_bytes) > MAX_EQ_FILE_SIZE:
        raise ValueError(
            f"File too large. Maximum size: {MAX_EQ_FILE_SIZE // (1 << 20)}MB"
        )
    try:
        content = content_bytes.decode("utf-8")
    except UnicodeDecodeError:
        raise ValueError("File must be UTF-8 encoded text")
    report = validate_eq_profile_content(content)
    report["size_bytes"] = len(content_bytes)
    return content, safe, report


def parse_eq_profile_content(file_path: Path) -> dict[str, Any]:
    """Structured view of a saved profile: OPRA attribution header, Modern-
    Target band separation, raw content."""
    if not file_path.exists():
        return {"error": "File not found"}
    try:
        content = file_path.read_text(encoding="utf-8")
    except OSError as e:
        return {"error": f"Failed to read file: {e}"}

    lines = content.strip().split("\n")
    is_opra = any(line.startswith("# OPRA:") for line in lines)
    has_modern_target = any("Modern Target" in line for line in lines)

    opra_info: dict[str, str] = {}
    if is_opra:
        header_keys = {
            "# OPRA:": "product", "# Author:": "author",
            "# License:": "license", "# Source:": "source",
            "# Details:": "details",
        }
        for line in lines:
            for prefix, key in header_keys.items():
                if line.startswith(prefix):
                    opra_info[key] = line[len(prefix):].strip()

    filter_lines = [
        line.strip() for line in lines
        if line.strip().startswith(("Preamp:", "Filter"))
    ]
    opra_filters: list[str] = []
    correction_filters: list[str] = []
    if is_opra and has_modern_target:
        for line in filter_lines:
            if is_modern_target_filter(parse_filter_line(line)):
                correction_filters.append(line)
            else:
                opra_filters.append(line)
    else:
        opra_filters = filter_lines

    return {
        "source_type": "opra" if is_opra else "custom",
        "has_modern_target": has_modern_target,
        "opra_info": opra_info or None,
        "opra_filters": opra_filters,
        "original_filters": correction_filters,
        "raw_content": content,
    }
