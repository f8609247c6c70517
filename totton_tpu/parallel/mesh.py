"""Device mesh construction for the ('channel', 'time') sharding layout."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_channel: int | None = None,
    n_time: int | None = None,
    devices=None,
) -> Mesh:
    """Build a 2D Mesh with axes ('channel', 'time').

    Defaults: all channels on one shard, all devices along 'time' (time
    parallelism scales with pod size; channel count is fixed by the audio
    format). On multi-host, devices are ordered so the 'time' axis's
    neighboring shards land on ICI neighbors where possible (jax.devices()
    order groups by host).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_channel is None and n_time is None:
        n_channel, n_time = 1, n
    elif n_channel is None:
        n_channel = n // n_time
    elif n_time is None:
        n_time = n // n_channel
    need = n_channel * n_time
    if need > n:
        raise ValueError(
            f"mesh {n_channel}x{n_time} does not cover {n} devices"
        )
    if jax.process_count() > 1:
        # Multi-host: lay the grid out column-major so each time column
        # (all channel rows of one time shard) is a block of consecutive
        # devices — jax.devices() groups by process, so whole time columns
        # then belong to single processes. That is the contract the
        # per-process ingest path needs (each host feeds the time span its
        # own devices compute; ShardedUpsampler validates it) and keeps a
        # host's halo exchange on-host except at span boundaries.
        grid = np.asarray(devices[:need]).reshape(n_time, n_channel).T
    else:
        grid = np.asarray(devices[:need]).reshape(n_channel, n_time)
    return Mesh(grid, axis_names=("channel", "time"))
