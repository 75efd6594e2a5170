#!/usr/bin/env python
"""Measure halo duplication vs ppermute halo exchange on a device mesh.

VERDICT round 1 item 10 asked for the claim "framing-time halo
duplication beats a runtime collective exchange" to be MEASURED, not
asserted.  This tool times both formulations of the sharded block
demodulator (`parallel/pipeline.py`) over the same stream on an
N-device mesh (virtual CPU devices by default — set
XLA_FLAGS=--xla_force_host_platform_device_count=N), verifies their
packet-relevant outputs agree, and prints one JSON line with per-call
medians plus the ingest-bytes accounting that motivates each mode:

  duplication — ships block_len/core_len (~1.45x at the production
    geometry) more samples to devices, zero collectives in the program;
  exchange    — ships disjoint cores (1.0x) plus ONE ring ppermute of
    halo samples (halo/core ~ 45% of one block, ~3% of a 16-block
    shard's ingest) inside the program.

Usage: python tools/halo_mode_bench.py [--devices 8] [--blocks 64]
       [--iters 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ais_tpu.core.params import DemodConfig
    from ais_tpu.ops.cplx import to_planes
    from ais_tpu.parallel.mesh import make_time_mesh
    from ais_tpu.parallel.pipeline import (
        make_halo_exchange_demod,
        make_sharded_demod,
    )
    from ais_tpu.pipeline.receiver import required_halo

    cfg = DemodConfig()
    block_len = 16384
    core_len = block_len - required_halo(cfg)
    halo = block_len - core_len
    n_blocks = args.blocks
    mesh = make_time_mesh(args.devices)

    rng = np.random.default_rng(0)
    stream = (
        rng.normal(size=n_blocks * core_len + halo)
        + 1j * rng.normal(size=n_blocks * core_len + halo)
    ).astype(np.complex64) * 0.1
    # The ring wraps the final block's halo to shard 0's stream head
    # while the duplication framing reads the true tail: zeroing both
    # makes the two paths see identical data everywhere (the production
    # framer arranges the same equivalence — see test_parallel.py).
    stream[:halo] = 0
    stream[n_blocks * core_len :] = 0

    # Duplication framing: (n_blocks, block_len) overlapping windows.
    idx = np.arange(n_blocks)[:, None] * core_len + np.arange(block_len)
    dup_in = to_planes(stream[idx])
    # Exchange framing: (n_blocks, core_len) disjoint cores.
    exch_in = to_planes(
        stream[: n_blocks * core_len].reshape(n_blocks, core_len)
    )

    dup_fn = make_sharded_demod(cfg, block_len, core_len, mesh)
    exch_fn = make_halo_exchange_demod(
        cfg, block_len, core_len, mesh, n_blocks=n_blocks
    )

    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("time"))
    dup_dev = jax.device_put(dup_in, sh)
    exch_dev = jax.device_put(exch_in, sh)

    rd = jax.tree.map(np.asarray, dup_fn(dup_dev))   # warm-up + result
    re_ = jax.tree.map(np.asarray, exch_fn(exch_dev))
    agree = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            (rd.valid, rd.position, rd.bits), (re_.valid, re_.position, re_.bits)
        )
    )

    def timeit(fn, x):
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(fn(x))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_dup = timeit(dup_fn, dup_dev)
    t_exch = timeit(exch_fn, exch_dev)

    print(
        json.dumps(
            {
                "probe": "halo_mode_bench",
                "devices": args.devices,
                "n_blocks": n_blocks,
                "block_len": block_len,
                "core_len": core_len,
                "outputs_agree": agree,
                "dup_ms": round(t_dup * 1e3, 1),
                "exchange_ms": round(t_exch * 1e3, 1),
                "exchange_over_dup": round(t_exch / t_dup, 3),
                "dup_ingest_ratio": round(block_len / core_len, 3),
                "exchange_ici_frac": round(
                    halo / (n_blocks // args.devices * core_len), 4
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
