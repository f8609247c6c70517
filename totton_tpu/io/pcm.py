"""PCM sample format conversion, vectorized.

Bit-exact with the reference's conversions (src/alsa/alsa_common.cpp:12-127):
same scale factors and the same asymmetric clamp constants on the
float->int path (0.9999695 for s16, 0.9999999 for s24/s32 — chosen so
value * scale never reaches +full-scale).
"""

from __future__ import annotations

import enum

import numpy as np

from totton_tpu import native as _native


class PcmFormat(enum.Enum):
    S16_LE = "S16_LE"
    S24_3LE = "S24_3LE"
    S32_LE = "S32_LE"

    @property
    def bytes(self) -> int:
        return {"S16_LE": 2, "S24_3LE": 3, "S32_LE": 4}[self.value]

    @property
    def scale(self) -> float:
        return {"S16_LE": 32768.0, "S24_3LE": 8388608.0, "S32_LE": 2147483648.0}[
            self.value
        ]

    @property
    def clamp_hi(self) -> float:
        return 0.9999695 if self is PcmFormat.S16_LE else 0.9999999


def parse_format(name: str) -> PcmFormat:
    """Accepts s16/s16_le, s24/s24_3le, s32/s32_le (case-insensitive)."""
    lower = name.lower()
    table = {
        "s16": PcmFormat.S16_LE,
        "s16_le": PcmFormat.S16_LE,
        "s24": PcmFormat.S24_3LE,
        "s24_3le": PcmFormat.S24_3LE,
        "s32": PcmFormat.S32_LE,
        "s32_le": PcmFormat.S32_LE,
    }
    if lower not in table:
        raise ValueError(f"Unknown PCM format: {name}")
    return table[lower]


def bytes_per_sample(fmt: PcmFormat) -> int:
    return fmt.bytes


def pcm_to_float(data: bytes | np.ndarray, fmt: PcmFormat) -> np.ndarray:
    """Raw interleaved PCM bytes -> float32 samples in [-1, 1)."""
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray
    ) else data.view(np.uint8).ravel()
    if len(buf) % fmt.bytes != 0:
        raise ValueError(
            f"buffer length {len(buf)} not a multiple of sample size {fmt.bytes}"
        )
    native = _native.pcm_to_float(buf, fmt)
    if native is not None:
        return native
    if fmt is PcmFormat.S16_LE:
        ints = buf.view("<i2").astype(np.float32)
    elif fmt is PcmFormat.S32_LE:
        ints = buf.view("<i4").astype(np.float32)
    else:  # S24_3LE: sign-extend 3-byte little-endian
        tri = buf.reshape(-1, 3).astype(np.int32)
        vals = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
        vals = np.where(vals & 0x00800000, vals - (1 << 24), vals)
        ints = vals.astype(np.float32)
    return ints * np.float32(1.0 / fmt.scale)


def float_to_pcm(x: np.ndarray, fmt: PcmFormat) -> bytes:
    """float32 samples -> raw interleaved PCM bytes, with clamping."""
    x = np.asarray(x, dtype=np.float32).ravel()
    native = _native.float_to_pcm(x, fmt)
    if native is not None:
        return native
    clamped = np.clip(x, np.float32(-1.0), np.float32(fmt.clamp_hi))
    scaled = clamped * np.float32(fmt.scale)
    if fmt is PcmFormat.S16_LE:
        return scaled.astype("<i2").tobytes()
    if fmt is PcmFormat.S32_LE:
        # float32 * 2^31 can round up to 2^31 (unrepresentable); match the
        # C cast-to-int behavior by clipping at the integer edge in int64.
        vals = np.clip(scaled.astype(np.int64), -(1 << 31), (1 << 31) - 1)
        return vals.astype("<i4").tobytes()
    vals = np.clip(scaled.astype(np.int64), -(1 << 23), (1 << 23) - 1).astype(
        np.int32
    )
    out = np.empty((len(vals), 3), dtype=np.uint8)
    out[:, 0] = vals & 0xFF
    out[:, 1] = (vals >> 8) & 0xFF
    out[:, 2] = (vals >> 16) & 0xFF
    return out.tobytes()


def deinterleave(x: np.ndarray, channels: int) -> np.ndarray:
    """Interleaved [n*channels] -> [channels, n]."""
    x = np.asarray(x)
    if x.size % channels != 0:
        raise ValueError(
            f"sample count {x.size} not divisible by channels {channels}"
        )
    return x.reshape(-1, channels).T.copy()


def interleave(x: np.ndarray) -> np.ndarray:
    """[channels, n] -> interleaved [n*channels]."""
    return np.asarray(x).T.reshape(-1).copy()
