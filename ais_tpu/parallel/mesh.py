"""Device meshes for sharded AIS decoding.

The reference is a single-process thread-per-block program with no
distributed axis at all (SURVEY.md section 2.4).  Here the two natural
data axes shard over the chip mesh:

  - `time`: overlap-save time blocks of one continuous stream — each
    block carries its own halo, so blocks are embarrassingly parallel
    and XLA needs no collectives in the hot path;
  - `stream`: independent IQ streams (channels, antennas, captures).
"""

from __future__ import annotations

import jax


def make_time_mesh(n_devices: int | None = None, axis: str = "time") -> jax.sharding.Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return jax.make_mesh((n,), (axis,), devices=devices[:n])


def make_stream_time_mesh(
    n_stream: int, n_time: int | None = None
) -> jax.sharding.Mesh:
    devices = jax.devices()
    n_time = n_time or len(devices) // n_stream
    return jax.make_mesh((n_stream, n_time), ("stream", "time"))
