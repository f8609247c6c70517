"""Shared utilities: timing, profiling, logging."""

from totton_tpu.utils.profiling import BlockTimer, trace_context

__all__ = ["BlockTimer", "trace_context"]
