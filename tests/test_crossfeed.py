"""Crossfeed engine tests: 2x2 matrix convolution vs a scipy oracle."""

import numpy as np
import pytest
from scipy import signal as ssig

from totton_tpu.engine.crossfeed import (
    CrossfeedFilter,
    CrossfeedProcessor,
    crossfeed_signal,
)
from totton_tpu.filters.hrtf import generate_all


@pytest.fixture(scope="module")
def cf_filter(tmp_path_factory):
    out = tmp_path_factory.mktemp("cf")
    paths = generate_all(out, sizes=["M"], families=["44k"])
    return CrossfeedFilter.load(paths[0])


def oracle(x, channels):
    ll, lr, rl, rr = (c.astype(np.float64) for c in channels)
    n = x.shape[1]
    out_l = ssig.fftconvolve(x[0], ll)[:n] + ssig.fftconvolve(x[1], rl)[:n]
    out_r = ssig.fftconvolve(x[0], lr)[:n] + ssig.fftconvolve(x[1], rr)[:n]
    return np.stack([out_l, out_r])


def test_matches_convolution_oracle(cf_filter, rng):
    x = (rng.normal(size=(2, 5000)) * 0.3).astype(np.float32)
    y = crossfeed_signal(x, cf_filter)
    ref = oracle(x.astype(np.float64), cf_filter.channels)
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5


def test_streaming_continuity(cf_filter, rng):
    proc = CrossfeedProcessor(cf_filter)
    bi = proc.block_input_frames
    x = (rng.normal(size=(2, 4 * bi)) * 0.3).astype(np.float32)
    chunks = [proc.process_block(x[:, i * bi : (i + 1) * bi]) for i in range(4)]
    streamed = np.concatenate(chunks, axis=1)
    proc.reset()
    one_shot = proc.process_block(x)
    np.testing.assert_allclose(streamed, one_shot, rtol=1e-5, atol=1e-6)


def test_direct_path_is_dry_plus_cross(cf_filter):
    # Left-only impulse: out_L = LL (unit impulse), out_R = LR.
    x = np.zeros((2, 2000), np.float32)
    x[0, 0] = 1.0
    y = crossfeed_signal(x, cf_filter)
    assert y[0, 0] == pytest.approx(1.0, abs=1e-5)  # dry direct
    n = min(2000, cf_filter.taps)
    np.testing.assert_allclose(y[1, :n], cf_filter.channels[1][:n],
                               atol=1e-5)


def test_stereo_only(cf_filter):
    proc = CrossfeedProcessor(cf_filter)
    with pytest.raises(ValueError, match="stereo"):
        proc.process_block(np.zeros((4, proc.block_input_frames)))
