"""Sharded block demodulation via shard_map over a device mesh.

Sequence parallelism for a streaming signal (SURVEY.md sections 2.4, 5.7):
the stream is framed into overlap-save blocks `(n_blocks, block_len)`
stepped by `core_len`, each block carrying its own halo.  Sharding the
block axis over the mesh's `time` axis makes every device decode its
blocks independently — the halo duplication at framing time replaces any
runtime neighbor exchange, so the jitted program contains zero
collectives and scales linearly.  The dedup rule (a burst belongs to the
block whose *core* holds its preamble start) guarantees each packet is
decoded exactly once across devices.

A second `stream` mesh axis shards independent IQ streams (config 4 of
BASELINE.json's multi-stream batch).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ais_tpu.core.params import DemodConfig
from ais_tpu.pipeline.receiver import make_burst_demod


def make_sharded_demod(
    cfg: DemodConfig,
    block_len: int,
    core_len: int,
    mesh: jax.sharding.Mesh,
    time_axis: str = "time",
):
    """(n_blocks, block_len) -> BurstRecords with leading block axis,
    block axis sharded over `time_axis`.  n_blocks must be a multiple of
    the mesh axis size."""
    demod = make_burst_demod(cfg, block_len, core_len)  # batch-native
    fn = shard_map(
        demod,
        mesh=mesh,
        in_specs=P(time_axis),
        out_specs=P(time_axis),
    )
    return jax.jit(fn)


def make_sharded_stream_demod(
    cfg: DemodConfig,
    block_len: int,
    core_len: int,
    mesh: jax.sharding.Mesh,
    stream_axis: str = "stream",
    time_axis: str = "time",
):
    """(n_streams, n_blocks, block_len) -> BurstRecords, streams sharded
    over `stream_axis` and blocks over `time_axis`."""
    demod = jax.vmap(make_burst_demod(cfg, block_len, core_len))  # vmap streams; batch-native over blocks
    fn = shard_map(
        demod,
        mesh=mesh,
        in_specs=P(stream_axis, time_axis),
        out_specs=P(stream_axis, time_axis),
    )
    return jax.jit(fn)
