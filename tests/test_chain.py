"""CrossfeedChain: upsample -> crossfeed with constant latency."""

import numpy as np

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
