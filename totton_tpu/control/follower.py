"""Control-plane fan-out for multi-host streams: the follower side.

On a multi-process mesh only process 0 (the leader) serves the REQ/REP
command endpoint; it publishes every state-changing command as a JSON
event on its PUB socket (control/daemon.py _publish_event). Followers
subscribe and replay the same action on their local engine shard, so a
single RELOAD / PHASE_TYPE_SET / SOFT_RESET / SHUTDOWN reaches every
host's spectrum — without it, a swap applied on one host would diverge
the replicated filter spectrum across the mesh (and with time sharding,
eventually the audio at shard boundaries).

The reference has no multi-host path at all (SURVEY.md §2.3); its PUB
socket exists but nothing ever publishes or subscribes
(src/zmq/command_server.cpp:189-207).
"""

from __future__ import annotations

import json
import sys
import threading
from typing import Callable


class ControlFollower:
    """Subscribes to a leader ControlDaemon's PUB endpoint and applies its
    events via the same callbacks the leader's daemon uses locally."""

    def __init__(
        self,
        pub_endpoint: str,
        on_reload: Callable[[], None] | None = None,
        on_soft_reset: Callable[[], None] | None = None,
        on_phase_change: Callable[[str], None] | None = None,
        on_shutdown: Callable[[], None] | None = None,
    ) -> None:
        self.pub_endpoint = pub_endpoint
        self._on_reload = on_reload
        self._on_soft_reset = on_soft_reset
        self._on_phase_change = on_phase_change
        self._on_shutdown = on_shutdown
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        #: events successfully applied (observability/test hook)
        self.applied: list[str] = []

    def _apply(self, msg: dict) -> None:
        event = msg.get("event")
        if event == "reload" and self._on_reload:
            self._on_reload()
        elif event == "soft_reset" and self._on_soft_reset:
            self._on_soft_reset()
        elif event == "phase_type" and self._on_phase_change:
            phase = msg.get("phase_type")
            if phase in ("minimum", "linear"):
                self._on_phase_change(phase)
        elif event == "shutdown" and self._on_shutdown:
            self._on_shutdown()
        self.applied.append(str(event))

    def _run(self) -> None:
        import zmq

        ctx = zmq.Context.instance()
        sub = ctx.socket(zmq.SUB)
        sub.setsockopt(zmq.LINGER, 0)
        sub.setsockopt_string(zmq.SUBSCRIBE, "")
        sub.connect(self.pub_endpoint)
        poller = zmq.Poller()
        poller.register(sub, zmq.POLLIN)
        try:
            while not self._stop.is_set():
                if not poller.poll(100):
                    continue
                raw = sub.recv_string()
                try:
                    msg = json.loads(raw)
                except json.JSONDecodeError:
                    continue
                try:
                    self._apply(msg)
                except Exception as e:  # keep following on a failed apply
                    print(f"control follower: {msg.get('event')} failed: {e}",
                          file=sys.stderr)
        finally:
            sub.close(0)

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="totton-control-follower")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
