"""Multi-host distributed decode (BASELINE.json config 5).

The reference is strictly single-process (SURVEY.md §2.4).  Here a pod
slice decodes one continuous stream cooperatively:

  - `jax.distributed` forms the process group over DCN;
  - the global mesh is (host, chip) flattened into one `time` axis (or
    (stream, time) when multiple independent streams exist);
  - each host's ingest feeds its local shard of overlap-save blocks —
    because every block carries its own halo from framing, *no sample
    data ever crosses hosts*: the only cross-host traffic is the
    per-block burst-record gather, a few KB/s;
  - the dedup rule (a packet belongs to the block whose core holds its
    preamble start) holds globally, so each packet is decoded exactly
    once across the pod.

Scaling efficiency is therefore bounded only by ingest balance, not by
collective bandwidth — the jitted program contains no collectives.
"""

from __future__ import annotations

import numpy as np

import jax

from ais_tpu.core.params import DemodConfig
from ais_tpu.parallel.mesh import make_time_mesh
from ais_tpu.parallel.pipeline import make_sharded_demod
from ais_tpu.pipeline.receiver import frame_stream, required_halo


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or no-op single-process) the jax.distributed process group."""
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


class DistributedBlockDecoder:
    """Shard a stream's overlap-save blocks over every device in the mesh.

    Single-host multi-chip today; with `init_distributed` the same code
    runs over a multi-host mesh (jax.make_mesh spans all processes'
    devices and each host supplies its local block shard).
    """

    def __init__(
        self,
        demod: DemodConfig = DemodConfig(),
        block_len: int = 16384,
        n_devices: int | None = None,
    ):
        self.cfg = demod
        self.block_len = block_len
        self.core_len = block_len - required_halo(demod)
        self.mesh = make_time_mesh(n_devices)
        self.n_devices = self.mesh.devices.size
        self._fn = make_sharded_demod(demod, block_len, self.core_len, self.mesh)

    def decode_blocks(self, blocks: np.ndarray):
        """(n_blocks, block_len) -> BurstRecords; n_blocks must divide
        evenly over the mesh (pad with zero blocks if needed).

        Multi-process (after `init_distributed`): every process passes
        the same global `blocks` array; each supplies only its local
        shard to the device mesh (`make_array_from_callback` reads just
        the addressable indices), the jitted program runs with zero
        collectives, and the small per-block record tensors are
        all-gathered back to every host over DCN — the only cross-host
        traffic, a few KB per second of signal.
        """
        n = blocks.shape[0]
        pad = (-n) % self.n_devices
        if pad:
            blocks = np.concatenate(
                [blocks, np.zeros((pad, self.block_len), blocks.dtype)]
            )
        from ais_tpu.ops.cplx import to_planes

        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("time")
        )
        planes = to_planes(blocks)
        if jax.process_count() > 1:
            xs = jax.make_array_from_callback(
                planes.shape, sharding, lambda idx: planes[idx]
            )
            rec = self._fn(xs)
            from jax.experimental import multihost_utils

            rec = jax.tree.map(
                lambda a: np.asarray(
                    multihost_utils.process_allgather(a, tiled=True)
                ),
                rec,
            )
            return rec, n
        xs = jax.device_put(planes, sharding)
        return self._fn(xs), n  # caller slices records back to n blocks

    def decode_stream(self, iq: np.ndarray, designator: str = "A"):
        """Convenience: frame + decode + host-deframe one contiguous array."""
        from ais_tpu.pipeline.host import PacketDeduper, decode_block_records

        blocks = frame_stream(iq, self.block_len, self.core_len)
        records, n = self.decode_blocks(blocks)
        records = jax.tree.map(np.asarray, records)
        dedup = PacketDeduper()
        packets = []
        for b in range(n):
            rec_b = jax.tree.map(lambda a: a[b], records)
            packets.extend(
                decode_block_records(
                    rec_b,
                    b * self.core_len,
                    designator=designator,
                    deduper=dedup,
                    fftlen=self.cfg.fftlen,
                )
            )
        return packets
