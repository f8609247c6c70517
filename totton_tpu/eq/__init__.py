"""Parametric EQ subsystem.

Equalizer-APO-format parsing, RBJ audio-EQ-cookbook biquads, and the two
application paths:

- **Spectral bake-in** (primary): the EQ's complex response sampled on the
  overlap-save rfft grid is multiplied into the filter spectrum once at
  (re)load — zero runtime cost (reference intent:
  include/audio/eq_to_fir.h:34-37).
- **Time-domain cascade** (alternate): jitted cascaded-biquad kernel via
  lax.scan for EQ without a convolution filter in the chain.

The reference implements only PK/LS/HS and bypasses everything else
(src/audio/eq_to_fir.cpp:60-66); this implementation covers the full
cookbook set (LP/HP/BP/notch/AP/shelf variants) as a strict superset.
"""

from totton_tpu.eq.apo import (
    EqBand,
    EqProfile,
    FilterType,
    parse_eq_file,
    parse_eq_string,
)
from totton_tpu.eq.biquad import (
    BiquadCoeffs,
    biquad_coeffs,
    biquad_response,
    profile_response,
    profile_magnitude_for_fft,
    profile_response_for_fft,
    rfft_bin_frequencies,
)
from totton_tpu.eq.iir import biquad_cascade, make_cascade_step

__all__ = [
    "EqBand",
    "EqProfile",
    "FilterType",
    "parse_eq_file",
    "parse_eq_string",
    "BiquadCoeffs",
    "biquad_coeffs",
    "biquad_response",
    "profile_response",
    "profile_magnitude_for_fft",
    "profile_response_for_fft",
    "rfft_bin_frequencies",
    "biquad_cascade",
    "make_cascade_step",
]
