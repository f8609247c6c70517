"""Control plane: ZeroMQ REQ/REP command server, daemon, and client.

Wire-protocol parity with the reference (src/zmq/command_server.cpp,
zmq_server_main.cpp): requests are a bare command token or a
{"cmd": ..., ...} JSON object; responses are
{"status":"ok","data":...} / {"status":"error","error_code":...,
"message":...}. Command set: PING, STATS, RELOAD, SOFT_RESET,
PHASE_TYPE_GET/SET, LIST_ALSA_DEVICES, SHUTDOWN.
"""

from totton_tpu.control.server import ZmqCommandServer
from totton_tpu.control.client import DaemonClient
from totton_tpu.control.daemon import ControlDaemon, DEFAULT_ENDPOINT
from totton_tpu.control.follower import ControlFollower

__all__ = [
    "ZmqCommandServer",
    "DaemonClient",
    "ControlDaemon",
    "ControlFollower",
    "DEFAULT_ENDPOINT",
]
