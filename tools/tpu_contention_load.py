#!/usr/bin/env python
"""Load generator: stream incompressible h2d transfers at wire size.

Companion to tools/tpu_fused_split_probe.py for the service-contention
experiment: run this in one process while the split probe times the
benched program (device-resident input) in another.  If the probe's
per-call exec inflates toward the fan's observed per-dispatch time, the
tunnel service serializes h2d with exec and the fan rides a capacity
ceiling; if it stays at the solo time, the fan's exec inflation is
client-side.  Prints one JSON line per --report transfers; exits after
--seconds.
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
    ap.add_argument("--nbytes", type=int, default=7_085_275)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--report", type=int, default=8)
    args = ap.parse_args()

    import jax

    # A FRESH array object with fresh content every transfer: jax
    # memoizes device_put by host-array identity, so cycling a fixed
    # pool measures the cache, not the link (first version of this
    # probe reported a fictitious ~1.5 GB/s that way).  The ~20 ms
    # rng regeneration is excluded from the timed window.
    rng = np.random.default_rng(1)
    t_end = time.time() + args.seconds
    n = 0
    ts = []
    while time.time() < t_end:
        buf = rng.integers(0, 256, args.nbytes, dtype=np.uint8)
        t0 = time.time()
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        dt = time.time() - t0
        ts.append(dt)
        n += 1
        if n % args.report == 0:
            print(
                json.dumps(
                    {
                        "load_transfers": n,
                        "mbps": round(
                            args.nbytes / np.median(ts[-args.report:]) / 1e6, 1
                        ),
                    }
                ),
                flush=True,
            )
        del d
    print(json.dumps({"load_done": n}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
