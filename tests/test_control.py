"""Control-plane tests.

Modeled on the reference's test_zmq_server_e2e.cpp: spawn the real daemon
process, poll PING until ready, exercise the full command surface including
error paths, then SHUTDOWN -> process exit. Plus in-process protocol tests.
"""

import json
import subprocess
import sys
import time

import pytest

from totton_tpu.control.client import DaemonClient
from totton_tpu.control.daemon import ControlDaemon
from totton_tpu.control.server import build_error, build_ok, parse_request


class TestProtocol:
    def test_parse_raw_token(self):
        req = parse_request("  PING \n")
        assert req.cmd == "PING" and not req.is_json

    def test_parse_json(self):
        req = parse_request('{"cmd": "PHASE_TYPE_SET", "phase": "linear"}')
        assert req.cmd == "PHASE_TYPE_SET"
        assert req.param("phase", "phase_type") == "linear"

    def test_parse_json_phase_type_alias(self):
        req = parse_request('{"cmd": "X", "phase_type": "minimum"}')
        assert req.param("phase", "phase_type") == "minimum"

    def test_invalid_json(self):
        req = parse_request('{"cmd": ')
        assert req.parse_error

    def test_missing_cmd(self):
        req = parse_request('{"phase": "linear"}')
        assert req.parse_error == "cmd is required"

    def test_envelopes(self):
        assert json.loads(build_ok({"a": 1})) == {"status": "ok",
                                                  "data": {"a": 1}}
        assert build_ok() == '{"status":"ok"}'
        err = json.loads(build_error("UNKNOWN_CMD", "unknown command"))
        assert err["status"] == "error" and err["error_code"] == "UNKNOWN_CMD"


class TestDaemonInProcess:
    @pytest.fixture
    def daemon(self, tmp_path):
        d = ControlDaemon(
            endpoint=f"ipc://{tmp_path}/test.sock",
            stats_path=str(tmp_path / "stats.json"),
        )
        d.start()
        yield d
        d.stop()

    @pytest.fixture
    def client(self, daemon):
        return DaemonClient(endpoint=daemon.endpoint, timeout_ms=3000)

    def test_ping(self, client):
        assert client.ping()

    def test_stats_counters(self, client, daemon):
        assert client.reload_config().ok
        assert client.reload_config().ok
        assert client.soft_reset().ok
        stats = client.stats()
        assert stats.ok
        assert stats.data["reloads"] == 2
        assert stats.data["soft_resets"] == 1
        assert stats.data["uptime_ms"] >= 0
        assert stats.data["phase_type"] == "minimum"

    def test_stats_merges_stream_file(self, client, daemon, tmp_path):
        (tmp_path / "stats.json").write_text(
            json.dumps({"frames_in": 42, "xruns": {}})
        )
        stats = client.stats()
        assert stats.data["stream"]["frames_in"] == 42

    def test_phase_type_round_trip(self, client):
        assert client.get_phase_type().data["phase_type"] == "minimum"
        r = client.set_phase_type("linear")
        assert r.ok and r.data["phase_type"] == "linear"
        assert client.get_phase_type().data["phase_type"] == "linear"
        # "min" alias normalizes to "minimum"
        assert client.set_phase_type("min").data["phase_type"] == "minimum"

    def test_phase_type_invalid(self, client):
        r = client.set_phase_type("warped")
        assert not r.ok and r.error_code == "INVALID_PARAMS"

    def test_unknown_command(self, client):
        r = client.request("NOT_A_COMMAND")
        assert not r.ok and r.error_code == "UNKNOWN_CMD"

    def test_invalid_json_request(self, client):
        r = client.request('{"cmd": ')
        assert not r.ok and r.error_code == "INVALID_JSON"

    def test_list_devices(self, client):
        r = client.list_devices()
        assert r.ok and {"playback", "capture"} <= r.data.keys()

    def test_reload_callback_fires(self, tmp_path):
        fired = []
        d = ControlDaemon(
            endpoint=f"ipc://{tmp_path}/cb.sock",
            on_reload=lambda: fired.append(1),
            on_phase_change=lambda p: fired.append(p),
        )
        d.start()
        try:
            c = DaemonClient(endpoint=d.endpoint, timeout_ms=3000)
            c.reload_config()
            c.set_phase_type("linear")
            assert fired == [1, "linear"]
        finally:
            d.stop()

    def test_failed_phase_swap_keeps_reported_phase(self, tmp_path):
        """A raising on_phase_change (e.g. the linear filter is missing)
        must return INTERNAL and leave the daemon reporting the phase the
        engine is actually running."""
        def boom(phase):
            raise FileNotFoundError("no linear filter in dir")

        d = ControlDaemon(
            endpoint=f"ipc://{tmp_path}/fail.sock",
            on_phase_change=boom,
            phase_type="minimum",
        )
        d.start()
        try:
            c = DaemonClient(endpoint=d.endpoint, timeout_ms=3000)
            r = c.set_phase_type("linear")
            assert not r.ok and r.error_code == "INTERNAL"
            assert d.phase_type == "minimum"
            assert c.get_phase_type().data["phase_type"] == "minimum"
        finally:
            d.stop()

    def test_client_timeout_when_no_server(self, tmp_path):
        c = DaemonClient(endpoint=f"ipc://{tmp_path}/nobody.sock",
                         timeout_ms=200)
        r = c.request("PING")
        assert not r.ok and r.error_code == "TIMEOUT"


def test_daemon_subprocess_e2e(tmp_path):
    """Full e2e: real process, real sockets, SHUTDOWN -> clean exit."""
    endpoint = f"ipc://{tmp_path}/e2e.sock"
    proc = subprocess.Popen(
        [sys.executable, "-m", "totton_tpu.cli.control",
         "--endpoint", endpoint],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        client = DaemonClient(endpoint=endpoint, timeout_ms=500)
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline:
            if client.ping():
                break
            time.sleep(0.1)
        else:
            pytest.fail("daemon never answered PING")

        assert client.stats().ok
        assert client.set_phase_type("linear").ok
        assert client.get_phase_type().data["phase_type"] == "linear"
        assert client.shutdown().ok
        assert proc.wait(timeout=10) == 0
        out = proc.stdout.read()
        assert "ZMQ server listening" in out
        assert "ZMQ server stopped" in out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


class TestPhaseTypeInit:
    """Round-1 regression: the standalone daemon always booted
    phase_type="minimum" regardless of config.json filter.phaseType, so
    /api/daemon/phase-type could disagree with what the streamer loaded."""

    def test_explicit_phase(self, tmp_path):
        d = ControlDaemon(endpoint=f"ipc://{tmp_path}/a.sock",
                          phase_type="linear")
        assert d.phase_type == "linear"

    def test_min_alias_normalized(self, tmp_path):
        d = ControlDaemon(endpoint=f"ipc://{tmp_path}/b.sock",
                          phase_type="min")
        assert d.phase_type == "minimum"

    def test_phase_from_config(self, tmp_path, monkeypatch):
        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"filter": {"phaseType": "linear"}}))
        monkeypatch.setenv("TOTTON_CONFIG_PATH", str(cfg))
        d = ControlDaemon(endpoint=f"ipc://{tmp_path}/c.sock")
        assert d.phase_type == "linear"

    def test_default_minimum_without_config(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TOTTON_CONFIG_PATH", str(tmp_path / "none.json"))
        d = ControlDaemon(endpoint=f"ipc://{tmp_path}/d.sock")
        assert d.phase_type == "minimum"

    def test_invalid_config_phase_falls_back(self, tmp_path, monkeypatch):
        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"filter": {"phaseType": "weird"}}))
        monkeypatch.setenv("TOTTON_CONFIG_PATH", str(cfg))
        d = ControlDaemon(endpoint=f"ipc://{tmp_path}/e.sock")
        assert d.phase_type == "minimum"


class TestPubEvents:
    """State-changing commands publish JSON events on the PUB socket
    (the reference opens the socket via TOTTON_ZMQ_PUB_ENDPOINT but its
    daemon never publishes; here subscribers get live notifications)."""

    def test_reload_and_phase_events_published(self, tmp_path):
        import json as _json
        import time

        import zmq

        from totton_tpu.control.client import DaemonClient
        from totton_tpu.control.daemon import ControlDaemon

        endpoint = f"ipc://{tmp_path}/cmd.sock"
        pub_endpoint = f"ipc://{tmp_path}/pub.sock"
        daemon = ControlDaemon(endpoint=endpoint, pub_endpoint=pub_endpoint,
                               phase_type="minimum", heartbeat_s=0)
        daemon.start()
        try:
            ctx = zmq.Context.instance()
            sub = ctx.socket(zmq.SUB)
            sub.setsockopt_string(zmq.SUBSCRIBE, "")
            sub.setsockopt(zmq.RCVTIMEO, 5000)
            sub.connect(pub_endpoint)
            time.sleep(0.3)  # let the SUB connect before publishing

            client = DaemonClient(endpoint=endpoint, timeout_ms=5000)
            assert client.reload_config().ok
            event = _json.loads(sub.recv_string())
            assert event["event"] == "reload" and event["count"] == 1

            assert client.set_phase_type("linear").ok
            event = _json.loads(sub.recv_string())
            assert event == {"event": "phase_type", "phase_type": "linear",
                             "seq": 2}

            assert client.soft_reset().ok
            event = _json.loads(sub.recv_string())
            assert event["event"] == "soft_reset"
            sub.close(0)
        finally:
            daemon.stop()

    def test_pub_env_fallback(self, tmp_path, monkeypatch):
        from totton_tpu.control.daemon import ControlDaemon

        monkeypatch.setenv("TOTTON_ZMQ_PUB_ENDPOINT",
                           f"ipc://{tmp_path}/envpub.sock")
        daemon = ControlDaemon(endpoint=f"ipc://{tmp_path}/cmd2.sock")
        assert daemon.server.pub_endpoint == f"ipc://{tmp_path}/envpub.sock"


class TestFanOutDelivery:
    """PUB/SUB fan-out delivery robustness: sequence numbers on every
    state-changing event + periodic 'state' heartbeats let a follower
    DETECT dropped events (ZMQ slow-joiner / reconnect) and resync from
    the carried leader state instead of diverging forever."""

    def _follower(self):
        from totton_tpu.control.follower import ControlFollower

        calls = []
        f = ControlFollower(
            "inproc://unused",
            on_reload=lambda: calls.append("reload"),
            on_soft_reset=lambda: calls.append("soft_reset"),
            on_phase_change=lambda p: calls.append(f"phase:{p}"),
            on_shutdown=lambda: calls.append("shutdown"),
        )
        return f, calls

    def test_in_order_events_no_resync(self):
        f, calls = self._follower()
        f._apply({"event": "phase_type", "phase_type": "linear", "seq": 1})
        f._apply({"event": "reload", "seq": 2, "phase_type": "linear"})
        f._apply({"event": "state", "seq": 2, "phase_type": "linear"})
        assert calls == ["phase:linear", "reload"]
        assert f.seq_applied == 2

    def test_heartbeat_detects_slow_joiner_gap(self):
        # Follower connected AFTER the leader published seq 1..3: the
        # first thing it sees is a heartbeat — it must converge.
        f, calls = self._follower()
        f._apply({"event": "state", "seq": 3, "phase_type": "linear",
                  "reloads": 1, "shutdown": False})
        assert calls == ["phase:linear"]
        assert f.seq_applied == 3
        # Identical heartbeat again: no duplicate work.
        f._apply({"event": "state", "seq": 3, "phase_type": "linear",
                  "reloads": 1, "shutdown": False})
        assert calls == ["phase:linear"]

    def test_gap_on_direct_event_resyncs_first(self):
        f, calls = self._follower()
        f._apply({"event": "phase_type", "phase_type": "linear", "seq": 1})
        # seq 2 (a phase change back to minimum) was dropped; seq 3 is a
        # soft_reset carrying the leader's current phase.
        f._apply({"event": "soft_reset", "seq": 3, "phase_type": "minimum"})
        assert calls == ["phase:linear", "phase:minimum", "soft_reset"]
        assert f.seq_applied == 3

    def test_gap_on_phase_event_applies_once(self):
        f, calls = self._follower()
        f._apply({"event": "phase_type", "phase_type": "linear", "seq": 5})
        # Gap (1..4 missed) on a phase event: resync IS the apply.
        assert calls == ["phase:linear"]
        assert f.seq_applied == 5

    def test_shutdown_via_heartbeat_flag_and_dedupe(self):
        f, calls = self._follower()
        f._apply({"event": "shutdown", "seq": 1, "phase_type": "minimum"})
        f._apply({"event": "state", "seq": 1, "phase_type": "minimum",
                  "shutdown": True})
        assert calls.count("shutdown") == 1
        # A follower that MISSED the shutdown event hears it from the
        # heartbeat flag.
        g, calls2 = self._follower()
        g._apply({"event": "state", "seq": 1, "phase_type": "minimum",
                  "shutdown": True})
        assert "shutdown" in calls2

    def test_daemon_heartbeat_published(self, tmp_path):
        import json as _json
        import time

        import zmq

        from totton_tpu.control.client import DaemonClient
        from totton_tpu.control.daemon import ControlDaemon

        endpoint = f"ipc://{tmp_path}/hb_cmd.sock"
        pub_endpoint = f"ipc://{tmp_path}/hb_pub.sock"
        daemon = ControlDaemon(endpoint=endpoint, pub_endpoint=pub_endpoint,
                               phase_type="minimum", heartbeat_s=0.1)
        daemon.start()
        try:
            ctx = zmq.Context.instance()
            sub = ctx.socket(zmq.SUB)
            sub.setsockopt_string(zmq.SUBSCRIBE, "")
            sub.setsockopt(zmq.RCVTIMEO, 5000)
            sub.connect(pub_endpoint)
            time.sleep(0.3)
            client = DaemonClient(endpoint=endpoint, timeout_ms=5000)
            assert client.set_phase_type("linear").ok
            # Within a few heartbeat periods a state event with the new
            # phase and the bumped seq must arrive.
            deadline = time.time() + 5
            state = None
            while time.time() < deadline:
                msg = _json.loads(sub.recv_string())
                if msg["event"] == "state" and msg["seq"] >= 1:
                    state = msg
                    break
            assert state is not None
            assert state["phase_type"] == "linear"
            assert state["shutdown"] is False
            sub.close(0)
        finally:
            daemon.stop()

    def test_late_follower_converges_via_heartbeat(self, tmp_path):
        """THE slow-joiner e2e over real sockets: the leader's phase
        change happens BEFORE the follower exists; the follower must
        still converge (from the periodic state heartbeat)."""
        import time

        from totton_tpu.control.client import DaemonClient
        from totton_tpu.control.daemon import ControlDaemon
        from totton_tpu.control.follower import ControlFollower

        endpoint = f"ipc://{tmp_path}/late_cmd.sock"
        pub_endpoint = f"ipc://{tmp_path}/late_pub.sock"
        daemon = ControlDaemon(endpoint=endpoint, pub_endpoint=pub_endpoint,
                               phase_type="minimum", heartbeat_s=0.1)
        daemon.start()
        follower = None
        try:
            client = DaemonClient(endpoint=endpoint, timeout_ms=5000)
            assert client.set_phase_type("linear").ok  # nobody listening

            calls = []
            follower = ControlFollower(
                pub_endpoint,
                on_phase_change=lambda p: calls.append(p))
            follower.start()
            deadline = time.time() + 10
            while time.time() < deadline and "linear" not in calls:
                time.sleep(0.05)
            assert "linear" in calls
            assert follower.seq_applied >= 1
        finally:
            if follower is not None:
                follower.stop()
            daemon.stop()
