#!/usr/bin/env python
"""One process of a multi-host distributed decode (test worker).

Usage:
  python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> <out.json>

Each process joins the jax.distributed group over DCN (TCP), forms a
global (num_procs x local_devices) `time` mesh, decodes a deterministic
synthesized capture through `DistributedBlockDecoder`, and writes its
decoded packet list as JSON.  The test harness asserts every process
produced the identical, single-process-equal packet set — proving the
multi-host path end-to-end (SURVEY.md §5.8, BASELINE config 5).
"""

from __future__ import annotations

import json
import sys
import time


def synthesize(n: int):
    """Deterministic capture: 4 packets spread across the stream (one per
    future shard) plus one straddling a shard boundary."""
    import numpy as np

    from ais_tpu.pipeline.receiver import required_halo
    from ais_tpu.core.params import DemodConfig
    from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

    core = 16384 - required_halo(DemodConfig())
    pkt = make_packet_iq(
        aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D"),
        samples_per_symbol=5,
    )
    rng = np.random.default_rng(42)
    iq = ((rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.01).astype(
        np.complex64
    )
    # One packet per mesh quarter + one straddling the half-way shard cut.
    offsets = [5000, n // 4 + 2000, n // 2 - 600, 3 * n // 4 + 9000]
    for off in offsets:
        iq[off : off + pkt.size] += pkt
    return iq, core


def main() -> int:
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    # Optional bench mode: argv[5] = n_blocks, argv[6] = timed iterations.
    # With iters > 0 the worker warms up once, then times `iters`
    # steady-state decodes of the same stream (used by
    # tools/multihost_scaling.py to measure DCN overhead).
    n_blocks = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    import jax

    jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    from ais_tpu.parallel.distributed import (
        DistributedBlockDecoder,
        init_distributed,
    )

    init_distributed(
        None if coordinator == "none" else coordinator, num_procs, proc_id
    )
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())

    dec = DistributedBlockDecoder()
    assert dec.n_devices == n_global
    iq, _ = synthesize(dec.core_len * n_blocks)
    t1 = time.time()
    packets = dec.decode_stream(iq)
    t2 = time.time()
    steady_s = None
    if iters > 0:
        ts = time.time()
        for _ in range(iters):
            packets = dec.decode_stream(iq)
        steady_s = (time.time() - ts) / iters
    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": proc_id,
                "n_processes": jax.process_count(),
                "n_devices": n_global,
                "local_devices": len(jax.local_devices()),
                "packets": [
                    {"nmea": p.nmea, "abs_sample": p.abs_sample}
                    for p in packets
                ],
                "init_s": round(t1 - t0, 2),
                "decode_s": round(t2 - t1, 2),
                "steady_s": None if steady_s is None else round(steady_s, 3),
                "n_blocks": n_blocks,
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
