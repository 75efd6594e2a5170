#!/usr/bin/env python
"""Probe: characterize the tunnel host<->device link.

The fan telemetry (bench.py fan_collect_split) shows per-connection h2d
"bandwidth" of >1 GB/s when probed with zeros, while real ci1 wire steps
(sigma-delta 1-bit IQ, near-maximum-entropy bytes) block ~0.5 s for
9.5 MB (~20 MB/s).  Hypothesis: the tunnel compresses transfers, so the
link budget is ENTROPY, not bytes.  This probe measures device_put
round-trips for buffers of identical size and very different
compressibility, both directions, to decide the wire-format strategy
(ops/convert.py) on real numbers.

ONE probe per process (CLAUDE.md protocol); every transfer is consumed
with np.asarray / block_until_ready on a buffer that is then read back.

Usage: python tools/tpu_link_probe.py [--mb 9.5] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=9.5)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import jax

    n = int(args.mb * 1e6)
    rng = np.random.default_rng(0)

    # Real wire bytes: ci1-encode a full-load-ish scene chunk.
    from ais_tpu.ops.convert import host_bytes

    iq = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ci1 = host_bytes((iq * 0.5).astype(np.complex64), "ci1")  # n//4 bytes
    ci1 = np.tile(ci1, 4)[:n]  # same byte count as the others

    bufs = {
        "zeros": np.zeros(n, np.uint8),
        "ramp": np.tile(np.arange(256, dtype=np.uint8), n // 256 + 1)[:n],
        "random": rng.integers(0, 256, size=n, dtype=np.uint8),
        "ci1_wire": ci1,
    }

    out = {"probe": "tpu_link", "backend": str(jax.devices()[0]), "mb": args.mb}

    print(f"[probe] backend up: {out['backend']}", file=sys.stderr, flush=True)
    for name, buf in bufs.items():
        print(f"[probe] {name}: warmup h2d...", file=sys.stderr, flush=True)
        # h2d: timed device_put + drain.  First one pays setup; report
        # the min of iters after one warmup.
        dev = jax.block_until_ready(jax.device_put(buf))  # warmup
        h2d = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            dev = jax.block_until_ready(jax.device_put(buf))
            h2d.append(time.perf_counter() - t0)
        # d2h of the same buffer.
        d2h = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            back = np.asarray(dev)
            d2h.append(time.perf_counter() - t0)
        assert back[:64].tobytes() == buf[:64].tobytes()
        out[name] = {
            "h2d_mbps": round(n / min(h2d) / 1e6, 1),
            "d2h_mbps": round(n / min(d2h) / 1e6, 1),
            "h2d_ms": [round(t * 1e3, 1) for t in h2d],
        }
        print(f"[probe] {name}: {out[name]}", file=sys.stderr, flush=True)
        del dev

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
