"""Test-audio tooling: signal generation and output validation.

Parity with the reference's scripts/test/ package (generate_test_audio.py,
validate_output.py): sine / log-sweep / white-noise generation and
signal-metric validation (correlation, spectral similarity, RMS delta).
"""

from totton_tpu.testing.signals import log_sweep, sine, white_noise
from totton_tpu.testing.validate_output import validate_audio

__all__ = ["sine", "log_sweep", "white_noise", "validate_audio"]
