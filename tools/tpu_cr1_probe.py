#!/usr/bin/env python
"""Probe: the 1-bit-per-sample cr1 wire vs ci1, end-to-end on the
tunnel TPU.

cr1 (fs/4-IF bandpass sigma-delta, ops/convert.py:iq_from_bytes_cr1)
halves the wire bytes of ci1; the ingest link binds end-to-end
throughput, so this should approach a 2x step-rate win when the step
is transfer-dominated.  Like tools/tpu_cd1_probe.py, this measures the
REAL pipeline (submit_wire -> collect at the bench geometry),
alternating formats each round with DISTINCT step content, and asserts
both formats decode the identical packet set (dedupers reset between
decodes — the cd1 probe's "parity 0" was deduper carry-over plus the
advancing stream position, not a format defect).

Usage: python tools/tpu_cr1_probe.py [--rounds 4] [--blocks 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE_DIR = os.path.join(REPO, ".jax_cache")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=64)
    args = ap.parse_args()

    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.5")

    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import bench
    from ais_tpu.ops.convert import host_bytes
    from ais_tpu.pipeline.host import PacketDeduper
    from ais_tpu.pipeline.wideband import (
        WidebandConfig,
        WidebandReceiver,
        num_taps,
    )

    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len * (args.blocks - 1)
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    rx = WidebandReceiver(cfg, n_in=n_in)
    n_in = rx.n_in

    print(f"[probe] backend {jax.devices()[0]}, n_in {n_in}", file=sys.stderr,
          flush=True)
    iq, tx_packets = bench._scene(cfg, n_in, rx.step_raw)
    iq = (iq * 0.7).astype(np.complex64)

    def fresh(pos=0):
        rx._pos = pos
        rx._dedupers = [PacketDeduper() for _ in cfg.offsets_hz]

    def wires(r):
        sh = np.roll(iq, r * 977) if r else iq
        return {f: host_bytes(sh, f) for f in ("ci1", "cr1")}

    out = {"probe": "tpu_cr1", "backend": str(jax.devices()[0]),
           "n_in": n_in, "rows": []}

    w0 = wires(0)
    base_pkts = {}
    for fmt in ("ci1", "cr1"):
        fresh()
        t0 = time.time()
        pkts = rx.decode_wire(w0[fmt], fmt)
        print(f"[probe] {fmt} warm: {time.time()-t0:.1f}s, "
              f"{len(pkts)} packets", file=sys.stderr, flush=True)
        base_pkts[fmt] = {(p.payload, p.designator, p.abs_sample // 300)
                          for p in pkts}
        out[f"{fmt}_parity"] = round(
            bench._content_parity(pkts, tx_packets, cfg.decimation), 4
        )
    print(f"[probe] parity ci1 {out['ci1_parity']} cr1 {out['cr1_parity']}",
          file=sys.stderr, flush=True)

    for r in range(args.rounds):
        w = wires(r + 1)
        row = {}
        for fmt in ("ci1", "cr1"):
            fresh()
            t0 = time.perf_counter()
            h = rx.submit_wire(w[fmt], fmt, pos=0)
            pkts = rx.collect(h)
            dt = time.perf_counter() - t0
            row[fmt] = {
                "step_s": round(dt, 3),
                "msps": round(n_in / dt / 1e6, 1),
                "wire_mbps": round(w[fmt].nbytes / dt / 1e6, 1),
                "pkts": len(pkts),
            }
        row["speedup"] = round(row["ci1"]["step_s"] / row["cr1"]["step_s"], 3)
        out["rows"].append(row)
        print(f"[probe] round {r}: {row}", file=sys.stderr, flush=True)

    med = sorted(r["speedup"] for r in out["rows"])[len(out["rows"]) // 2]
    out["median_speedup_cr1_over_ci1"] = med
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
