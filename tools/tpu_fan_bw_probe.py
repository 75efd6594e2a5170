#!/usr/bin/env python
"""Probe: how does tunnel h2d bandwidth aggregate across connections?

tpu_link_probe.py established that the tunnel compresses h2d (zeros move
~30x faster than random bytes), so the budget is ENTROPY, and that one
connection moves incompressible ci1 wire at ~40 MB/s.  The fan's value
hinges on whether N concurrent client connections aggregate (round-2
STATUS saw 103 MB/s over 3) or share one ~40-65 MB/s pipe (the round-3
bench saw ~16 MB/s/conn during fan steps).  This probe answers it with
ONLY transfers — no compilation, no execution — so the number is the
link itself, not the shared compile/exec service.

Per worker: device_put a wire-sized incompressible buffer ITERS times.
Two shapes:
  blocking  — block_until_ready after every put (the fan's stage+drain
              shape today);
  pipelined — enqueue DEPTH puts, then drain; measures whether the
              per-connection FIFO is ack-latency-bound.
Workers barrier-start so the transfers truly overlap.  Parent reports
per-N aggregate MB/s (payload bytes x iters x N / wall).

Usage: python tools/tpu_fan_bw_probe.py [--mb 9.5] [--iters 4]
       [--conns 1 2 3 4] [--depth 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(wid, nbytes, iters, depth, barrier, out_q):
    try:
        os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
        os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.1")
        import numpy as np

        import jax

        rng = np.random.default_rng(wid)
        buf = rng.integers(0, 256, size=nbytes, dtype=np.uint8)
        # Connection warm-up (setup cost paid outside the timed region).
        jax.block_until_ready(jax.device_put(buf))

        barrier.wait(timeout=600)
        t0 = time.perf_counter()
        if depth <= 1:
            for _ in range(iters):
                jax.block_until_ready(jax.device_put(buf))
        else:
            pending = []
            for _ in range(iters):
                pending.append(jax.device_put(buf))
                while len(pending) >= depth:
                    jax.block_until_ready(pending.pop(0))
            for h in pending:
                jax.block_until_ready(h)
        dt = time.perf_counter() - t0
        out_q.put((wid, dt, None))
    except Exception as e:  # noqa: BLE001 — surface to parent
        out_q.put((wid, None, f"{type(e).__name__}: {e}"))


def run_shape(n_conns, nbytes, iters, depth):
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_conns + 1)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_worker,
            args=(w, nbytes, iters, depth, barrier, out_q),
            daemon=True,
        )
        for w in range(n_conns)
    ]
    for p in procs:
        p.start()
    barrier.wait(timeout=600)  # workers warmed; release them together
    t0 = time.perf_counter()
    per = []
    for _ in range(n_conns):
        wid, dt, err = out_q.get(timeout=600)
        if err:
            raise RuntimeError(f"worker {wid}: {err}")
        per.append(dt)
    wall = time.perf_counter() - t0
    for p in procs:
        p.join(timeout=30)
    total = nbytes * iters * n_conns
    return {
        "conns": n_conns,
        "depth": depth,
        "agg_mbps": round(total / wall / 1e6, 1),
        "per_conn_mbps": [round(nbytes * iters / dt / 1e6, 1) for dt in per],
        "wall_s": round(wall, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=9.5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--conns", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    nbytes = int(args.mb * 1e6)
    rows = []
    for n in args.conns:
        for depth in (1, args.depth):
            r = run_shape(n, nbytes, args.iters, depth)
            rows.append(r)
            print(f"[probe] {r}", file=sys.stderr, flush=True)
    print(json.dumps({"probe": "tpu_fan_bw", "mb": args.mb, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
