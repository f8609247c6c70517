"""CrossfeedChain: upsample -> crossfeed with constant latency."""

import numpy as np
import pytest

from totton_tpu.engine.chain import CrossfeedChain
from totton_tpu.engine.crossfeed import (
    CrossfeedFilter,
    CrossfeedProcessor,
    crossfeed_signal,
)
from totton_tpu.engine.upsampler import StreamingUpsampler, upsample_signal
from totton_tpu.filters.hrtf import generate_all
from totton_tpu.filters.sidecar import load_filter


def test_chain_equals_sequential(coefficients_dir, tmp_path, rng):
    lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
    cf_path = generate_all(tmp_path, sizes=["M"], families=["44k"])[0]
    cf_filter = CrossfeedFilter.load(cf_path)

    chain = CrossfeedChain(
        StreamingUpsampler(lf, channels=2),
        CrossfeedProcessor(cf_filter),
    )
    bi = chain.block_input_frames
    x = (rng.normal(size=(2, 40 * bi)) * 0.3).astype(np.float32)

    # Stream through the chain in chunks.
    chunks = [
        chain.process_block(x[:, i * 10 * bi : (i + 1) * 10 * bi])
        for i in range(4)
    ]
    y = np.concatenate(chunks, axis=1)
    assert y.shape == (2, x.shape[1] * lf.ratio)

    # Reference: offline upsample then offline crossfeed, shifted by the
    # chain's constant latency.
    up = upsample_signal(x, lf)
    ref = crossfeed_signal(up, cf_filter)
    d = chain.latency
    np.testing.assert_allclose(y[:, d:], ref[:, : ref.shape[1] - d],
                               rtol=1e-4, atol=1e-5)
    # The first `latency` samples are the priming zeros.
    np.testing.assert_allclose(y[:, :d], 0, atol=1e-7)


def test_chain_reset_flushes_stale_audio(coefficients_dir, tmp_path, rng):
    """reset() on the chain must flush the crossfeed FIFO/pending audio:
    post-reset output may contain no pre-reset samples (the SOFT_RESET
    contract — the control daemon targets the OUTERMOST engine)."""
    lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
    cf_path = generate_all(tmp_path, sizes=["M"], families=["44k"])[0]
    chain = CrossfeedChain(
        StreamingUpsampler(lf, channels=2),
        CrossfeedProcessor(CrossfeedFilter.load(cf_path)),
    )
    bi = chain.block_input_frames
    # Enough blocks that the chain's constant-latency FIFO is past its
    # priming zeros and real audio flows.
    nb = chain.latency // (bi * chain.ratio) + 8
    loud = (rng.normal(size=(2, nb * bi)) * 0.5).astype(np.float32)
    chain.process_block(loud)
    # Stale audio exists: WITHOUT reset, a silence block still drains
    # pre-reset samples out of the FIFO/overlap (proves the test bites).
    stale = chain.process_block(np.zeros((2, bi), np.float32))
    assert np.max(np.abs(stale)) > 1e-4

    chain.process_block(loud)  # refill with pre-reset audio
    chain.reset()
    y = chain.process_block(np.zeros((2, bi), np.float32))
    np.testing.assert_allclose(y, 0.0, atol=1e-9)


def test_chain_reset_only_inner_upsampler_is_insufficient(
        coefficients_dir, tmp_path, rng):
    """Regression guard for the round-2 bug: resetting only the inner
    upsampler leaves the chain's pending/FIFO stale — the buggy wiring
    must produce nonzero output where the correct one produces silence."""
    lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
    cf_path = generate_all(tmp_path, sizes=["M"], families=["44k"])[0]
    chain = CrossfeedChain(
        StreamingUpsampler(lf, channels=2),
        CrossfeedProcessor(CrossfeedFilter.load(cf_path)),
    )
    bi = chain.block_input_frames
    nb = chain.latency // (bi * chain.ratio) + 8
    loud = (rng.normal(size=(2, nb * bi)) * 0.5).astype(np.float32)
    chain.process_block(loud)
    chain.upsampler.reset()  # the round-2 bug: inner reset only
    y = chain.process_block(np.zeros((2, bi), np.float32))
    assert np.max(np.abs(y)) > 1e-6


def test_chain_rejects_device_pcm_upsampler(coefficients_dir):
    from totton_tpu.engine.chain import CrossfeedChain
    from totton_tpu.engine.upsampler import StreamingUpsampler
    from totton_tpu.filters.sidecar import load_filter
    from totton_tpu.io.pcm import PcmFormat

    lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
    eng = StreamingUpsampler(lf, channels=2, device_pcm=PcmFormat.S16_LE)
    with pytest.raises(ValueError, match="float-output upsampler"):
        CrossfeedChain(eng, object())
