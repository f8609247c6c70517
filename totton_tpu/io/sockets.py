"""Network audio transport: PCM streaming over TCP / unix-domain sockets.

The reference's live loop talks to ALSA hardware on both ends
(src/alsa/alsa_streamer_main.cpp:495-611). On a TPU host audio arrives over
the network; this module is the live-device analog: a framed PCM stream on
a stream socket, usable as `--in` / `--out` endpoints of totton-stream:

  totton-stream --in tcp-listen://:9000 --out tcp://dac-host:9001 --ratio 16

Spec grammar (both sources and sinks accept all four):
  tcp://host:port          active connect
  tcp-listen://[host]:port bind + accept ONE peer (host defaults 0.0.0.0)
  unix:/path               active connect (unix domain)
  unix-listen:/path        bind + accept ONE peer

Wire format: one 12-byte header sent by the AUDIO-SENDING side (whichever
end writes samples — independent of who initiated the connection), then an
endless interleaved sample stream:

  magic  b"TOTN"          4 bytes
  version u8 = 1
  format  u8              0 = float32 LE, 1 = S16_LE, 2 = S24_3LE, 3 = S32_LE
  channels u8
  flags   u8              reserved, 0
  rate    u32 LE          input sample rate in Hz

float32 (format 0) is the lossless chaining format between totton processes
(no quantization at process boundaries); the integer formats carry the
bit-exact PCM conversions of io/pcm.py (reference alsa_common semantics).

Semantics match the file/pipe endpoints: sources are low-latency (the
stream session dispatches block-at-a-time and pre-compiles its shapes,
io/stream.py _warm_up), reads block until at least one whole frame or EOF,
writes block on TCP backpressure (never drop), a closed peer is EOF on the
source side and a clean stop on the sink side.
"""

from __future__ import annotations

import os
import socket
import struct
import time

import numpy as np

from totton_tpu.io.devices import (
    AudioSink,
    AudioSource,
    SinkCapability,
    SinkClosedError,
)
from totton_tpu.io.pcm import (
    PcmFormat,
    TpdfDitherer,
    deinterleave,
    float_to_pcm,
    interleave,
    pcm_to_float,
)

MAGIC = b"TOTN"
VERSION = 1
HEADER = struct.Struct("<4sBBBBI")  # magic, ver, fmt, channels, flags, rate
HEADER_BYTES = HEADER.size

#: wire format codes <-> sample formats (None = raw float32)
_FMT_CODE: dict[PcmFormat | None, int] = {
    None: 0,
    PcmFormat.S16_LE: 1,
    PcmFormat.S24_3LE: 2,
    PcmFormat.S32_LE: 3,
}
_CODE_FMT = {v: k for k, v in _FMT_CODE.items()}

#: default connect retry window (seconds) — the peer process may still be
#: starting up (its first JAX compile can take a while on a cold cache)
CONNECT_TIMEOUT_S = float(os.environ.get("TOTTON_SOCKET_CONNECT_TIMEOUT", 30))
#: default accept window for listening endpoints
ACCEPT_TIMEOUT_S = float(os.environ.get("TOTTON_SOCKET_ACCEPT_TIMEOUT", 300))


def pack_header(fmt: PcmFormat | None, channels: int, rate: int) -> bytes:
    if channels < 1 or channels > 255:
        raise ValueError(f"channels out of range: {channels}")
    return HEADER.pack(MAGIC, VERSION, _FMT_CODE[fmt], channels, 0, rate)


def unpack_header(raw: bytes) -> tuple[PcmFormat | None, int, int]:
    """-> (fmt or None for float32, channels, rate)."""
    magic, ver, code, channels, _flags, rate = HEADER.unpack(raw)
    if magic != MAGIC:
        raise ValueError(f"bad stream magic {magic!r} (want {MAGIC!r})")
    if ver != VERSION:
        raise ValueError(f"unsupported stream version {ver}")
    if code not in _CODE_FMT:
        raise ValueError(f"unknown wire format code {code}")
    if channels < 1:
        raise ValueError("zero-channel stream")
    return _CODE_FMT[code], channels, rate


class SocketSpec:
    """Parsed socket endpoint spec."""

    def __init__(self, spec: str) -> None:
        self.raw = spec
        if spec.startswith("tcp-listen://"):
            self.family, self.listen = socket.AF_INET, True
            hostport = spec[len("tcp-listen://"):]
        elif spec.startswith("tcp://"):
            self.family, self.listen = socket.AF_INET, False
            hostport = spec[len("tcp://"):]
        elif spec.startswith("unix-listen:"):
            self.family, self.listen = socket.AF_UNIX, True
            self.path = spec[len("unix-listen:"):]
            return
        elif spec.startswith("unix:"):
            self.family, self.listen = socket.AF_UNIX, False
            self.path = spec[len("unix:"):]
            return
        else:
            raise ValueError(f"not a socket spec: {spec}")
        host, sep, port = hostport.rpartition(":")
        if not sep or not port.isdigit():
            raise ValueError(f"socket spec needs host:port - {spec}")
        self.host = host or ("0.0.0.0" if self.listen else "127.0.0.1")
        self.port = int(port)

    @staticmethod
    def matches(spec: str) -> bool:
        return spec.startswith(("tcp://", "tcp-listen://", "unix:",
                                "unix-listen:"))


def _listen(spec: SocketSpec) -> socket.socket:
    if spec.family == socket.AF_UNIX:
        try:
            os.unlink(spec.path)
        except FileNotFoundError:
            pass
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(spec.path)
    else:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((spec.host, spec.port))
    srv.listen(1)
    return srv


def _connect(spec: SocketSpec, timeout_s: float) -> socket.socket:
    """Connect with retries: the peer may still be binding/compiling."""
    deadline = time.monotonic() + timeout_s
    last: Exception | None = None
    while time.monotonic() < deadline:
        try:
            if spec.family == socket.AF_UNIX:
                sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                sock.connect(spec.path)
            else:
                sock = socket.create_connection((spec.host, spec.port),
                                                timeout=timeout_s)
            return sock
        except OSError as e:
            last = e
            time.sleep(0.1)
    raise OSError(f"cannot connect to {spec.raw} within {timeout_s}s: {last}")


def _open(spec: SocketSpec, timeout_s: float) -> socket.socket:
    if not spec.listen:
        sock = _connect(spec, timeout_s)
    else:
        srv = _listen(spec)
        srv.settimeout(ACCEPT_TIMEOUT_S)
        try:
            sock, _addr = srv.accept()
        finally:
            srv.close()
            if spec.family == socket.AF_UNIX:
                try:
                    os.unlink(spec.path)
                except FileNotFoundError:
                    pass
    if spec.family == socket.AF_INET:
        # Audio frames are small and latency-sensitive.
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    sock.settimeout(None)
    return sock


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError(
                f"peer closed during header ({len(buf)}/{n} bytes)")
        buf += chunk
    return bytes(buf)


class SocketSource(AudioSource):
    """Framed PCM stream socket as a capture endpoint.

    The header fixes format/channels/rate, so the CLI needs no --rate for
    socket input. Live transport: low_latency=True makes the stream
    session pre-compile its dispatch shapes and dispatch block-at-a-time
    (io/stream.py), exactly like a stdin pipe. Backpressures via TCP flow
    control, never drops.
    """

    low_latency = True

    def __init__(self, spec: str,
                 connect_timeout_s: float = CONNECT_TIMEOUT_S) -> None:
        self._sock = _open(SocketSpec(spec), connect_timeout_s)
        self._fmt, self.channels, rate = unpack_header(
            _recv_exact(self._sock, HEADER_BYTES))
        self.sample_rate = rate or None
        self._frame_bytes = self.channels * (
            4 if self._fmt is None else self._fmt.bytes)
        self._buf = bytearray()
        self._eof = False

    def read_frames(self, n: int) -> np.ndarray:
        """Blocks until >= 1 whole frame is buffered (or EOF); returns at
        most n frames — whatever arrived, for low latency."""
        want = n * self._frame_bytes
        while not self._eof and len(self._buf) < self._frame_bytes:
            try:
                chunk = self._sock.recv(max(want - len(self._buf), 65536))
            except (ConnectionResetError, OSError):
                chunk = b""
            if not chunk:
                self._eof = True
                break
            self._buf += chunk
        usable = min(len(self._buf), want)
        usable -= usable % self._frame_bytes
        if usable == 0:
            return np.zeros((self.channels, 0), dtype=np.float32)
        raw, self._buf = bytes(self._buf[:usable]), self._buf[usable:]
        if self._fmt is None:
            samples = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        else:
            samples = pcm_to_float(raw, self._fmt)
        return deinterleave(samples, self.channels)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class SocketSink(AudioSink):
    """Framed PCM stream socket as a playback endpoint.

    The header is written lazily on the first write_frames (channel count
    comes from the audio). sendall blocks on TCP backpressure — the
    session's output-ring semantics treat that as healthy flow control.
    """

    def __init__(self, spec: str, sample_rate: int,
                 fmt: PcmFormat | None = PcmFormat.S32_LE,
                 ditherer: TpdfDitherer | None = None,
                 connect_timeout_s: float = CONNECT_TIMEOUT_S) -> None:
        self._sock = _open(SocketSpec(spec), connect_timeout_s)
        self._rate = sample_rate
        self._fmt = fmt
        self._ditherer = ditherer
        self._header_sent = False
        self.capability = SinkCapability.unconstrained("socket")

    def _sendall(self, raw: bytes) -> None:
        """The docstring contract 'a closed peer is a clean stop on the
        sink side': a departed receiver surfaces as SinkClosedError, which
        stream sessions treat like source EOF (drain + exit cleanly)."""
        try:
            self._sock.sendall(raw)
        except (BrokenPipeError, ConnectionResetError) as e:
            raise SinkClosedError(f"socket peer closed: {e}") from e

    def write_frames(self, x: np.ndarray) -> None:
        x = np.atleast_2d(x)
        if not self._header_sent:
            self._sendall(pack_header(self._fmt, x.shape[0], self._rate))
            self._header_sent = True
        flat = interleave(x)
        if self._fmt is None:
            raw = flat.astype("<f4", copy=False).tobytes()
        else:
            raw = float_to_pcm(flat, self._fmt, self._ditherer)
        self._sendall(raw)

    def write_quantized(self, x: np.ndarray) -> None:
        if self._fmt is not PcmFormat.S16_LE:
            super().write_quantized(x)
            return
        x = np.atleast_2d(x)
        if not self._header_sent:
            self._sendall(pack_header(self._fmt, x.shape[0], self._rate))
            self._header_sent = True
        self._sendall(interleave(x).astype("<i2").tobytes())

    def close(self) -> None:
        try:
            self._sock.shutdown(socket.SHUT_WR)  # EOF for the peer
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass
