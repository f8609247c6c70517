"""Multi-process sharded-engine test: runs scripts/dryrun_multiprocess.py
(2 jax.distributed processes x 4 virtual CPU devices each — per-process
local ingest, gloo cross-process halo exchange, oracle-checked output).

Subprocess-based because jax.distributed can only be initialized once per
process; port offset avoids colliding with a manual run.
"""

import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).parent.parent / "scripts" / "dryrun_multiprocess.py"


def test_two_process_sharded_stream():
    proc = subprocess.run(
        [sys.executable, str(SCRIPT), "19917"],
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "PASS" in proc.stdout


STREAM_SCRIPT = Path(__file__).parent.parent / "scripts" / "stream_multiprocess.py"


def test_two_process_full_stream_session_with_live_reload():
    """FULL StreamSession across 2 jax.distributed processes, each running
    the real totton-stream CLI over its own channel rows, leader control
    daemon + follower fan-out, EQ hot-swap landing in BOTH processes'
    output mid-stream, every dispatch granule oracle-checked."""
    proc = subprocess.run(
        [sys.executable, str(STREAM_SCRIPT)],
        capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert "stream_multiprocess: PASS" in proc.stdout
