"""convert_audio CLI round-trip (reference scripts/test/convert_audio.py
semantics: WAV <-> raw interleaved PCM at s16/s24/s32)."""

import numpy as np
import pytest

from totton_tpu.io.pcm import parse_format
from totton_tpu.io.wav import read_wav, write_wav
from totton_tpu.testing.convert_audio import main
from totton_tpu.testing.signals import sine


@pytest.mark.parametrize("fmt", ["s16", "s24", "s32"])
def test_wav_raw_round_trip(tmp_path, fmt):
    x = sine(440.0, 0.05, 44100, amplitude=0.4, channels=2)
    src = tmp_path / "in.wav"
    raw = tmp_path / "mid.raw"
    back = tmp_path / "out.wav"
    f = parse_format(fmt)
    # Source WAV at the same depth, so its own quantization doesn't
    # dominate the raw round-trip tolerance.
    write_wav(str(src), x, 44100, fmt=f)

    assert main(["wav2raw", str(src), str(raw), "--format", fmt]) == 0
    assert raw.stat().st_size == x.shape[1] * 2 * f.bytes

    assert main(["raw2wav", str(raw), str(back), "--rate", "44100",
                 "--channels", "2", "--format", fmt]) == 0
    y, rate = read_wav(str(back))
    assert rate == 44100
    assert y.shape == x.shape
    # Quantization-bounded round trip (one LSB of the PCM format).
    lsb = 2.0 ** -(f.bytes * 8 - 1)
    np.testing.assert_allclose(y, x, atol=2 * lsb)
