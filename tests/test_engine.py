"""Engine-level tests: StreamingUpsampler facade, real designed filters vs a
float64 scipy oracle, filter selection rules."""

import numpy as np
import pytest
from scipy import signal as ssig

from totton_tpu.engine.selector import FilterSelectionError, resolve_filter_path
from totton_tpu.engine.upsampler import StreamingUpsampler, upsample_signal
from totton_tpu.filters.sidecar import load_filter


def snr_db(y, ref):
    noise = np.asarray(y, np.float64) - ref
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-300))


class TestStreamingUpsampler:
    def test_real_filter_against_scipy_oracle(self, coefficients_dir, rng):
        # Designed 2000-tap 2x filter; stream random audio through the engine
        # and compare against float64 scipy fftconvolve of the zero-stuffed
        # signal. SNR bound ~ float32 FFT noise floor.
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        eng = StreamingUpsampler(lf, channels=2)
        blocks = 3
        x = rng.normal(size=(2, blocks * eng.block_input_frames)).astype(
            np.float32
        ) * 0.3
        y = eng.process_block(x)
        assert y.shape == (2, blocks * lf.sidecar.block_size)

        for c in range(2):
            up = np.zeros(x.shape[1] * lf.ratio)
            up[:: lf.ratio] = x[c]
            ref = ssig.fftconvolve(up, lf.taps.astype(np.float64))[: len(up)]
            assert snr_db(y[c], ref) > 110.0

    def test_16x_filter(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_16x_*.json")))
        x = (rng.normal(size=(1, 2 * lf.sidecar.block_input_frames)) * 0.3).astype(
            np.float32
        )
        y = upsample_signal(x, lf)
        assert y.shape == (1, x.shape[1] * 16)
        up = np.zeros(x.shape[1] * 16)
        up[::16] = x[0]
        ref = ssig.fftconvolve(up, lf.taps.astype(np.float64))[: len(up)]
        assert snr_db(y[0], ref) > 110.0

    def test_sine_upsample_preserves_tone(self, coefficients_dir):
        # A passband sine must come out at the same frequency and amplitude
        # (DC gain ratio*0.99 cancels the 1/ratio zero-stuff loss).
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        fs_in = 352800
        n = 20000
        t = np.arange(n) / fs_in
        x = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)[None]
        y = upsample_signal(x, lf)[0]
        # Skip the filter's transient at both ends, measure steady state.
        steady = y[len(lf.taps) : -len(lf.taps)]
        assert len(steady) >= 16384
        spec = np.abs(np.fft.rfft(steady * np.hanning(len(steady))))
        f_peak = np.argmax(spec) * (fs_in * 2) / len(steady)
        assert abs(f_peak - 1000.0) < 30.0
        amp = np.max(np.abs(steady))
        assert 0.45 < amp < 0.52  # 0.5 * 0.99 plus ripple

    def test_reset_reproduces_stream_start(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        eng = StreamingUpsampler(lf, channels=1)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        y1 = eng.process_block(x)
        y2 = eng.process_block(x)  # now has history -> different output
        assert not np.allclose(y1, y2)
        eng.reset()
        y3 = eng.process_block(x)
        np.testing.assert_array_equal(y1, y3)

    def test_eq_hot_swap_changes_output(self, coefficients_dir, rng):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        eng = StreamingUpsampler(lf, channels=1)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        y1 = eng.process_block(x)
        eng.reset()
        eng.set_eq(np.full(eng.config.n_bins, 0.5))  # -6 dB broadband
        y2 = eng.process_block(x)
        np.testing.assert_allclose(y2, 0.5 * y1, rtol=1e-4, atol=1e-6)

    def test_shape_validation(self, coefficients_dir):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        eng = StreamingUpsampler(lf, channels=2)
        with pytest.raises(ValueError, match="channels"):
            eng.process_block(np.zeros((3, eng.block_input_frames)))
        with pytest.raises(ValueError, match="multiple"):
            eng.process_block(np.zeros((2, eng.block_input_frames - 1)))


class TestUpsampleSignal:
    def test_partial_block_zero_fill(self, coefficients_dir, rng):
        # Arbitrary (non-block-multiple) lengths: output is exactly n*ratio.
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        n = lf.sidecar.block_input_frames + 123
        x = rng.normal(size=(2, n)).astype(np.float32)
        y = upsample_signal(x, lf)
        assert y.shape == (2, n * lf.ratio)
        # Equals the prefix of processing the zero-padded signal.
        x_pad = np.pad(x, [(0, 0), (0, (-n) % lf.sidecar.block_input_frames)])
        y_full = upsample_signal(x_pad, lf)
        np.testing.assert_array_equal(y, y_full[:, : n * lf.ratio])


class TestSelector:
    @pytest.fixture
    def filter_dir(self, tmp_path):
        names = [
            "filter_44k_2x_80000_min_phase.json",
            "filter_44k_2x_2m_min_phase.json",
            "filter_44k_2x_100_linear_phase.json",
            "filter_48k_2x_80000_min_phase.json",
            "filter_44k_16x_80000_min_phase.json",
            "filter_44k_2x_junk_min_phase.json",
            "notafilter.json",
        ]
        for n in names:
            (tmp_path / n).write_text("{}")
        return tmp_path

    def test_explicit_path_wins(self, filter_dir):
        p = filter_dir / "notafilter.json"
        assert resolve_filter_path(filter_path=str(p)) == str(p)

    def test_explicit_path_missing(self):
        with pytest.raises(FilterSelectionError, match="not found"):
            resolve_filter_path(filter_path="/nonexistent.json")

    def test_highest_taps_wins_2m_token(self, filter_dir):
        # "2m" token = 640000 taps beats 80000.
        p = resolve_filter_path(filter_dir=str(filter_dir), phase="min",
                                ratio=2, input_rate=352800)
        assert p.endswith("filter_44k_2x_2m_min_phase.json")

    def test_low_latency_picks_lowest_taps(self, filter_dir):
        (filter_dir / "filter_44k_2x_8000_min_phase.json").write_text("{}")
        p = resolve_filter_path(filter_dir=str(filter_dir), phase="min",
                                ratio=2, input_rate=352800, latency="low")
        assert p.endswith("filter_44k_2x_8000_min_phase.json")
        # Default stays the reference rule: highest taps.
        p = resolve_filter_path(filter_dir=str(filter_dir), phase="min",
                                ratio=2, input_rate=352800)
        assert p.endswith("filter_44k_2x_2m_min_phase.json")

    def test_unknown_latency_mode_rejected(self, filter_dir):
        with pytest.raises(FilterSelectionError, match="latency"):
            resolve_filter_path(filter_dir=str(filter_dir), ratio=2,
                                input_rate=352800, latency="ultra")

    def test_family_by_divisibility(self, filter_dir):
        p = resolve_filter_path(filter_dir=str(filter_dir), phase="min",
                                ratio=2, input_rate=384000)
        assert "48k" in p

    def test_unsupported_family(self, filter_dir):
        with pytest.raises(FilterSelectionError, match="family"):
            resolve_filter_path(filter_dir=str(filter_dir), ratio=2,
                                input_rate=44101)

    def test_phase_and_ratio_filtering(self, filter_dir):
        p = resolve_filter_path(filter_dir=str(filter_dir), phase="linear",
                                ratio=2, input_rate=44100)
        assert p.endswith("filter_44k_2x_100_linear_phase.json")
        p16 = resolve_filter_path(filter_dir=str(filter_dir), phase="minimum",
                                  ratio=16, input_rate=44100)
        assert "16x" in p16

    def test_no_match(self, filter_dir):
        with pytest.raises(FilterSelectionError, match="not found"):
            resolve_filter_path(filter_dir=str(filter_dir), ratio=8,
                                input_rate=44100)


class TestSwapFade:
    """Click-free filter/EQ hot-swap crossfade (beyond reference: its RELOAD
    restarts the container, so a swap is always a hard gap)."""

    def _engine(self, coefficients_dir, fade):
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        return StreamingUpsampler(lf, channels=1, swap_fade_frames=fade)

    def test_fade_ramps_between_filters(self, coefficients_dir, rng):
        eng = self._engine(coefficients_dir, fade=4096)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32) * 0.3
        y_before = eng.process_block(x)
        eng.set_eq(np.full(eng.config.n_bins, 0.5))  # -6 dB broadband
        y_fade = eng.process_block(x)
        # During the ramp the output moves from old (1.0x) to new (0.5x);
        # after the ramp it is exactly the new filter's output.
        eng2 = self._engine(coefficients_dir, fade=0)
        eng2.process_block(x)
        eng2.set_eq(np.full(eng2.config.n_bins, 0.5))
        y_new = eng2.process_block(x)
        np.testing.assert_allclose(
            y_fade[:, 4096:], y_new[:, 4096:], rtol=1e-5, atol=1e-7
        )
        # First faded sample is ~the old output (ramp starts at 1/n new).
        y_old_ref = 2.0 * y_new  # new is exactly 0.5 * old
        mid = y_fade[0, :4096]
        lo = np.minimum(y_new[0, :4096], y_old_ref[0, :4096]) - 1e-6
        hi = np.maximum(y_new[0, :4096], y_old_ref[0, :4096]) + 1e-6
        assert np.all(mid >= lo) and np.all(mid <= hi)
        assert y_before.shape == y_fade.shape

    def test_abrupt_when_disabled(self, coefficients_dir, rng):
        eng = self._engine(coefficients_dir, fade=0)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        y1 = eng.process_block(x)
        eng.set_eq(np.full(eng.config.n_bins, 0.5))
        y2 = eng.process_block(x)
        assert not np.allclose(y2[:, :64], 0.75 * y1[:, :64] + 0.25 * y2[:, :64])

    def test_multiple_swaps_fade_from_last_heard(self, coefficients_dir, rng):
        eng = self._engine(coefficients_dir, fade=512)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32) * 0.3
        eng.process_block(x)
        eng.set_eq(np.full(eng.config.n_bins, 0.5))
        eng.set_eq(np.full(eng.config.n_bins, 0.25))  # second swap, no dispatch between
        y = eng.process_block(x)
        # Fade must start from the ORIGINAL (unity) spectrum, not the
        # intermediate 0.5 one: the first faded sample (ramp 1/512) is much
        # closer to the unity-filter output than to the 0.25x one.
        eng_u = self._engine(coefficients_dir, fade=0)
        eng_u.process_block(x)
        y_u = eng_u.process_block(x)
        d_unity = abs(y[0, 0] - y_u[0, 0])
        d_quarter = abs(y[0, 0] - 0.25 * y_u[0, 0])
        assert d_unity < d_quarter

    def test_reset_clears_pending_fade(self, coefficients_dir, rng):
        eng = self._engine(coefficients_dir, fade=512)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        eng.process_block(x)
        eng.set_eq(np.full(eng.config.n_bins, 0.5))
        eng.reset()
        y = eng.process_block(x)
        eng2 = self._engine(coefficients_dir, fade=0)
        eng2.set_eq(np.full(eng2.config.n_bins, 0.5))
        y_ref = eng2.process_block(x)
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-7)

    def test_geometry_change_skips_fade(self, coefficients_dir, rng):
        lf2 = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        lf16 = load_filter(next(coefficients_dir.glob("filter_44k_16x_*.json")))
        eng = StreamingUpsampler(lf2, channels=1, swap_fade_frames=512)
        x = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        eng.process_block(x)
        eng.load_filter(lf16)  # different geometry -> clean restart
        x16 = rng.normal(size=(1, eng.block_input_frames)).astype(np.float32)
        y = eng.process_block(x16)
        assert y.shape == (1, eng.config.block_size)

    def test_fade_carries_across_dispatches(self, coefficients_dir, rng):
        """The configured fade length is honored even when each dispatch
        is shorter than the window (low-latency single-block mode): the
        ramp starts at exactly 0 (sample 0 is pure old filter) and
        continues across process_block calls until swap_fade_frames
        output samples have ramped."""
        lf = load_filter(next(coefficients_dir.glob("filter_44k_2x_*.json")))
        total = 120  # > one block's output (block_size), forces carry
        eng = StreamingUpsampler(lf, channels=1, swap_fade_frames=total)
        assert total > eng.config.block_size
        eng_old = StreamingUpsampler(lf, channels=1)  # never swapped
        eng_new = StreamingUpsampler(lf, channels=1)  # swapped, no fade
        bi = eng.block_input_frames
        x = (rng.normal(size=(1, 6 * bi)) * 0.3).astype(np.float32)
        blocks = [x[:, i * bi:(i + 1) * bi] for i in range(6)]
        for e in (eng, eng_old, eng_new):
            e.process_block(blocks[0])
        eng.set_eq(np.full(eng.config.n_bins, 0.5))
        eng_new.set_eq(np.full(eng_new.config.n_bins, 0.5))
        got = np.concatenate(
            [eng.process_block(b) for b in blocks[1:]], axis=1)
        y_old = np.concatenate(
            [eng_old.process_block(b) for b in blocks[1:]], axis=1)
        y_new = np.concatenate(
            [eng_new.process_block(b) for b in blocks[1:]], axis=1)
        n = got.shape[1]
        ramp = np.minimum(np.arange(n, dtype=np.float32) / total, 1.0)
        expected = y_old * (1.0 - ramp) + y_new * ramp
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)
        # Sample 0 is bit-exactly the old filter's output.
        np.testing.assert_array_equal(got[:, 0], y_old[:, 0])
