"""Deployment restart hook tests: command strategy, Docker-socket strategy
(against a fake Engine API on a unix socket), resolver precedence, and the
web route's success/failure mapping."""

import socket
import threading

import pytest

from totton_tpu.web.services.restart import (
    RestartError,
    resolve_restart_fn,
    restart_container,
    restart_via_command,
)

pytest_plugins = "aiohttp.pytest_plugin"


class FakeDockerSocket:
    """Minimal Docker Engine API on an AF_UNIX socket: records the request
    line, answers a canned HTTP status."""

    def __init__(self, path, status=204, body=b""):
        self.path = str(path)
        self.status = status
        self.body = body
        self.requests = []
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(self.path)
        self._srv.listen(1)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with conn:
                data = conn.recv(65536)
                self.requests.append(data.decode("latin-1"))
                reason = {200: "OK", 204: "No Content",
                          404: "Not Found", 500: "Server Error"}
                head = (f"HTTP/1.1 {self.status} "
                        f"{reason.get(self.status, 'X')}\r\n"
                        f"Content-Length: {len(self.body)}\r\n"
                        "Content-Type: application/json\r\n\r\n")
                conn.sendall(head.encode() + self.body)

    def close(self):
        self._srv.close()


@pytest.fixture
def docker_sock(tmp_path):
    srv = FakeDockerSocket(tmp_path / "docker.sock")
    yield srv
    srv.close()


class TestRestartViaCommand:
    def test_success(self):
        assert restart_via_command("true") is True

    def test_failure_raises_with_stderr(self):
        with pytest.raises(RestartError, match="exited 3"):
            restart_via_command("echo broken >&2; exit 3")

    def test_timeout(self):
        with pytest.raises(RestartError, match="timed out"):
            restart_via_command("sleep 5", timeout_s=0.2)


class TestRestartContainer:
    def test_posts_engine_restart(self, docker_sock):
        assert restart_container("totton-dsp", docker_sock.path) is True
        assert docker_sock.requests[0].startswith(
            "POST /containers/totton-dsp/restart HTTP/1.1")

    def test_name_is_url_quoted(self, docker_sock):
        restart_container("a/b c", docker_sock.path)
        assert "POST /containers/a%2Fb%20c/restart" in docker_sock.requests[0]

    def test_error_status_raises(self, docker_sock):
        docker_sock.status = 404
        docker_sock.body = b'{"message":"No such container"}'
        with pytest.raises(RestartError, match="404"):
            restart_container("nope", docker_sock.path)

    def test_missing_socket_raises(self, tmp_path):
        with pytest.raises(RestartError, match="docker socket"):
            restart_container("x", str(tmp_path / "absent.sock"))


class TestResolveRestartFn:
    def test_nothing_configured(self, tmp_path):
        env = {"TOTTON_DOCKER_SOCKET": str(tmp_path / "absent.sock")}
        assert resolve_restart_fn(env) is None

    def test_command_wins(self, docker_sock):
        fn = resolve_restart_fn({
            "TOTTON_RESTART_CMD": "true",
            "TOTTON_DSP_CONTAINER": "totton-dsp",
            "TOTTON_DOCKER_SOCKET": docker_sock.path,
        })
        assert fn() is True
        assert docker_sock.requests == []  # command path, not docker

    def test_docker_when_container_named(self, docker_sock):
        fn = resolve_restart_fn({
            "TOTTON_DSP_CONTAINER": "mydsp",
            "TOTTON_DOCKER_SOCKET": docker_sock.path,
        })
        assert fn() is True
        assert "/containers/mydsp/restart" in docker_sock.requests[0]

    def test_docker_when_socket_exists(self, docker_sock):
        fn = resolve_restart_fn({"TOTTON_DOCKER_SOCKET": docker_sock.path})
        assert fn() is True
        assert "/containers/totton-dsp/restart" in docker_sock.requests[0]


class TestRestartRoute:
    async def _client(self, aiohttp_client, restart_fn):
        from totton_tpu.web.app import create_app

        return await aiohttp_client(create_app(restart_fn=restart_fn))

    async def test_success(self, aiohttp_client):
        calls = []
        client = await self._client(
            aiohttp_client, lambda: calls.append(1) or True)
        resp = await client.post("/api/daemon/restart")
        assert resp.status == 200
        assert (await resp.json())["restarted"] is True
        assert calls == [1]

    async def test_restart_error_maps_to_502(self, aiohttp_client):
        def boom():
            raise RestartError("docker restart of 'x' answered 404")

        client = await self._client(aiohttp_client, boom)
        resp = await client.post("/api/daemon/restart")
        assert resp.status == 502
        assert "404" in (await resp.json())["detail"]
