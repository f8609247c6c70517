"""Control daemon: the command set on top of ZmqCommandServer.

Parity with the reference's zmq_control_server binary
(src/zmq/zmq_server_main.cpp:144-226): PING, STATS (uptime/phase/counters),
RELOAD, SOFT_RESET, PHASE_TYPE_GET/SET (minimum|linear), LIST_ALSA_DEVICES,
SHUTDOWN. Unlike the shipped reference stub (which only tracks counters —
SURVEY.md L1 note), the daemon takes optional callbacks so RELOAD /
PHASE_TYPE_SET / SOFT_RESET can drive a live engine (hot filter swap without
restart), and STATS merges the streaming stats file when present.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Callable

from totton_tpu.control.server import ZmqCommandServer, ZmqRequest, build_error, build_ok

DEFAULT_ENDPOINT = "ipc:///tmp/totton_zmq.sock"
ENDPOINT_ENV = "TOTTON_ZMQ_ENDPOINT"
PUB_ENDPOINT_ENV = "TOTTON_ZMQ_PUB_ENDPOINT"
STATS_PATH_ENV = "TOTTON_STATS_PATH"
DEFAULT_STATS_PATH = "/tmp/gpu_upsampler_stats.json"


def _resolve_initial_phase(phase_type: str | None) -> str:
    """Initial PHASE_TYPE state: explicit value > config.json
    `filter.phaseType` > "minimum".

    Reading the config keeps a standalone daemon's reported phase in
    agreement with what the streamer loads from the same config (round-1
    drift: the daemon always booted "minimum").
    """
    if phase_type is None:
        try:
            from totton_tpu.web.services.config import load_config

            settings = load_config()
            if settings.filter is not None:
                phase_type = settings.filter.phase_type
        except Exception:
            phase_type = None
    if phase_type in ("min", "minimum"):
        return "minimum"
    if phase_type == "linear":
        return "linear"
    return "minimum"


class ControlDaemon:
    """Registers the command set and owns daemon-side state."""

    def __init__(
        self,
        endpoint: str | None = None,
        pub_endpoint: str | None = None,
        on_reload: Callable[[], None] | None = None,
        on_soft_reset: Callable[[], None] | None = None,
        on_phase_change: Callable[[str], None] | None = None,
        list_devices_fn: Callable[[], dict] | None = None,
        stats_path: str | None = None,
        phase_type: str | None = None,
    ) -> None:
        self.endpoint = endpoint or os.environ.get(ENDPOINT_ENV, DEFAULT_ENDPOINT)
        # PUB endpoint: flag > TOTTON_ZMQ_PUB_ENDPOINT env > off. When on,
        # state-changing commands publish JSON events (the reference opens
        # the socket via the same env, docker/entrypoint.sh:10,139, but its
        # shipped daemon never publishes anything; subscribers here get
        # real reload/phase/reset notifications).
        pub_endpoint = pub_endpoint or os.environ.get(PUB_ENDPOINT_ENV)
        self.server = ZmqCommandServer(self.endpoint, pub_endpoint)
        self._on_reload = on_reload
        self._on_soft_reset = on_soft_reset
        self._on_phase_change = on_phase_change
        if list_devices_fn is None:
            from totton_tpu.io.devices import list_devices as list_devices_fn
        self._list_devices = list_devices_fn
        self._stats_path = stats_path or os.environ.get(
            STATS_PATH_ENV, DEFAULT_STATS_PATH
        )

        self.phase_type = _resolve_initial_phase(phase_type)
        self.reload_count = 0
        self.soft_reset_count = 0
        self._start_time = time.monotonic()
        self._shutdown = threading.Event()

        s = self.server
        s.register("PING", lambda req: build_ok({"pong": True}))
        s.register("STATS", self._handle_stats)
        s.register("RELOAD", self._handle_reload)
        s.register("SOFT_RESET", self._handle_soft_reset)
        s.register("PHASE_TYPE_GET",
                   lambda req: build_ok({"phase_type": self.phase_type}))
        s.register("PHASE_TYPE_SET", self._handle_phase_set)
        s.register("LIST_ALSA_DEVICES", self._handle_list_devices)
        s.register("list_alsa_devices", self._handle_list_devices)
        s.register("SHUTDOWN", self._handle_shutdown)

    # -- handlers ---------------------------------------------------------

    def _handle_stats(self, req: ZmqRequest) -> str:
        data = {
            "uptime_ms": int((time.monotonic() - self._start_time) * 1000),
            "phase_type": self.phase_type,
            "reloads": self.reload_count,
            "soft_resets": self.soft_reset_count,
        }
        # Merge live stream stats when the streamer emits them.
        try:
            with open(self._stats_path) as f:
                data["stream"] = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
        return build_ok(data)

    def _publish_event(self, event: str, **payload) -> None:
        """Fire-and-forget PUB notification (no-op without a PUB socket)."""
        self.server.publish(json.dumps({"event": event, **payload}))

    def _handle_reload(self, req: ZmqRequest) -> str:
        self.reload_count += 1
        if self._on_reload is not None:
            self._on_reload()
        self._publish_event("reload", count=self.reload_count,
                            phase_type=self.phase_type)
        return build_ok({"reloaded": True})

    def _handle_soft_reset(self, req: ZmqRequest) -> str:
        self.soft_reset_count += 1
        if self._on_soft_reset is not None:
            self._on_soft_reset()
        self._publish_event("soft_reset", count=self.soft_reset_count)
        return build_ok({"reset": True})

    def _handle_phase_set(self, req: ZmqRequest) -> str:
        phase = req.param("phase", "phase_type") or ""
        if phase == "min":
            phase = "minimum"
        if phase not in ("minimum", "linear"):
            return build_error("INVALID_PARAMS",
                               "phase must be minimum or linear")
        # Callback first: a failed engine swap (e.g. no linear filter on
        # disk) raises -> dispatch returns INTERNAL and the reported phase
        # stays what the engine is actually running.
        if self._on_phase_change is not None:
            self._on_phase_change(phase)
        self.phase_type = phase
        self._publish_event("phase_type", phase_type=phase)
        return build_ok({"phase_type": self.phase_type})

    def _handle_list_devices(self, req: ZmqRequest) -> str:
        return build_ok(self._list_devices())

    def _handle_shutdown(self, req: ZmqRequest) -> str:
        # Publish BEFORE signaling shutdown: once the server stops, the PUB
        # socket is gone and followers would never hear it.
        self._publish_event("shutdown")
        self._shutdown.set()
        return build_ok({"shutdown": True})

    # -- lifecycle --------------------------------------------------------

    def start(self) -> None:
        self.server.start()

    def stop(self) -> None:
        self.server.stop()

    def wait_for_shutdown(self, timeout: float | None = None) -> bool:
        return self._shutdown.wait(timeout)

    @property
    def shutdown_requested(self) -> bool:
        return self._shutdown.is_set()
