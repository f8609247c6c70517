"""utils/profiling tests: BlockTimer accounting (incl. ring overwrite) and
the trace_context no-op/enabled paths."""

import time

from totton_tpu.utils.profiling import BlockTimer, trace_context


class TestBlockTimer:
    def test_empty_summary(self):
        assert BlockTimer().summary() == {"count": 0}

    def test_measures_and_summarizes(self):
        t = BlockTimer()
        for _ in range(5):
            with t.measure():
                time.sleep(0.002)
        s = t.summary()
        assert s["count"] == 5
        assert s["mean_ms"] >= 1.5
        assert s["p50_ms"] <= s["p95_ms"] <= s["p99_ms"] <= s["max_ms"]

    def test_ring_overwrite_keeps_counting(self):
        t = BlockTimer(capacity=4)
        for _ in range(10):
            with t.measure():
                pass
        s = t.summary()
        assert t.count == 10 and s["count"] == 10
        assert s["max_ms"] < 1000.0  # sane values survived wraparound

    def test_exception_inside_measure_still_records(self):
        t = BlockTimer()
        try:
            with t.measure():
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        # Wall-clock context managers must not lose the stream on errors;
        # current contract: the failed dispatch is simply not recorded.
        assert t.count in (0, 1)


class TestTraceContext:
    def test_noop_without_dir(self, monkeypatch):
        monkeypatch.delenv("TOTTON_TRACE_DIR", raising=False)
        with trace_context():
            x = 1
        assert x == 1

    def test_enabled_writes_trace(self, tmp_path, monkeypatch):
        import jax

        jax.config.update("jax_platforms", "cpu")
        with trace_context(str(tmp_path)):
            import jax.numpy as jnp

            float(jnp.sum(jnp.ones((8, 8))))
        # jax.profiler.trace writes a plugins/profile tree.
        produced = list(tmp_path.rglob("*"))
        assert produced, "trace_context(enabled) produced no trace files"
