"""totton-web CLI smoke: the process serves the API (the reference's
uvicorn entrypoint analog, web/main.py there)."""

import json
import socket
import subprocess
import sys
import time
import urllib.request


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_webserver_cli_serves_api(tmp_path):
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "totton_tpu.cli.webserver",
         "--host", "127.0.0.1", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.monotonic() + 30
        body = None
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/api/status", timeout=2) as r:
                    body = json.load(r)
                break
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError(
                        f"totton-web exited early: {proc.stdout.read()}")
                time.sleep(0.2)
        assert body is not None, "web server never answered /api/status"
        assert "daemon_running" in body
        # The dashboard page renders too.
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5) as r:
            assert r.status == 200
    finally:
        proc.terminate()
        proc.wait(timeout=10)
