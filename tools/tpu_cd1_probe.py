#!/usr/bin/env python
"""Probe: does the cd1 entropy-shaped wire beat ci1 end-to-end on the
tunnel TPU?

The tunnel compresses h2d transfers (tools/tpu_link_probe.py), so wire
throughput depends on layout compressibility, not just byte count.
Isolated device_put timings proved unreliable (elision/fast paths —
tools/tpu_fan_bw_probe.py, tools/tpu_wire_layout_probe.py), so this
probe measures the REAL pipeline: full submit_wire -> collect steps at
the bench geometry, alternating ci1 / cd1 each round with
DISTINCT step content (circularly shifted scene, re-encoded) so
neither format benefits from content reuse, and asserting both formats
decode the identical packet set.

Usage: python tools/tpu_cd1_probe.py [--rounds 4] [--blocks 64]
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

    # Distinct content per round: circular shift by a non-multiple of
    # the slot grid, re-encoded (the sigma-delta restarts, so the bytes
    # differ everywhere, but every packet stays inside the core span).
    def wires(r):
        sh = np.roll(iq, r * 977) if r else iq
        return {f: host_bytes(sh, f) for f in ("ci1", "cd1")}

    out = {"probe": "tpu_cd1", "backend": str(jax.devices()[0]),
           "n_in": n_in, "rows": []}

    # Warmup / compile both programs (and the parity check).
    w0 = wires(0)
    base_pkts = {}
    for fmt in ("ci1", "cd1"):
        t0 = time.time()
        pkts = rx.decode_wire(w0[fmt], fmt, )
        print(f"[probe] {fmt} warm: {time.time()-t0:.1f}s, "
              f"{len(pkts)} packets", file=sys.stderr, flush=True)
        base_pkts[fmt] = {(p.payload, p.designator) for p in pkts}
        parity = bench._content_parity(pkts, tx_packets, cfg.decimation)
        out[f"{fmt}_parity"] = round(parity, 4)
    assert base_pkts["ci1"] == base_pkts["cd1"], "format packet sets differ"

    for r in range(args.rounds):
        w = wires(r + 1)
        row = {}
        for fmt in ("ci1", "cd1"):
            rx._pos = 0
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
        row["speedup"] = round(row["ci1"]["step_s"] / row["cd1"]["step_s"], 3)
        out["rows"].append(row)
        print(f"[probe] round {r}: {row}", file=sys.stderr, flush=True)

    med = sorted(r["speedup"] for r in out["rows"])[len(out["rows"]) // 2]
    out["median_speedup_cd1_over_ci1"] = med
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
