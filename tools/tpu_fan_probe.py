#!/usr/bin/env python
"""Probe: multi-connection ingest fan with LOCK-SERIALIZED executions.

Prior measurement (pipeline/multiproc.py docstring): tunnel h2d
aggregates across client connections (~48/80/103 MB/s for 1/2/3), but
CONCURRENT executions from multiple clients thrash the shared service
(~29 s/step).  Hypothesis tested here: if executions are serialized
with a cross-process lock while transfers stay concurrent, the fan
recovers the aggregate transfer bandwidth without the thrash —
per-step time approaches max(transfer_amortized, exec).

Run standalone (ONE experiment per process tree — CLAUDE.md probing
protocol).  Prints one JSON line.

Usage: python tools/tpu_fan_probe.py [--workers 2] [--iters 6] [--fmt ci4]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def _worker(widx, n_workers, fmt, iters, blocks, lock, barrier, out_q):
    try:
        os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
        os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.2")
        import jax

        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        import jax.numpy as jnp

        from ais_tpu.ops.convert import host_bytes
        from ais_tpu.ops.fir import mixer_phase
        from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps

        cfg = WidebandConfig()
        n48 = cfg.block_len + cfg.core_len * (blocks - 1)
        n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
        rx = WidebandReceiver(cfg, n_in=n_in)
        n_in = rx.n_in

        rng = np.random.default_rng(widx)
        iq = (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)).astype(
            "complex64"
        )
        wire = host_bytes((iq * 0.05).astype("complex64"), fmt)

        # Warm: build + compile (cache hit) once, serialized.
        with lock:
            rx.decode_wire(wire, fmt)
        fn = rx._wire_fns[fmt]
        car, hf = getattr(rx, "_wire_bufs", {}).get(
            fmt, (rx._carriers, rx._hf)
        )
        phase0s = np.stack(
            [mixer_phase(off, cfg.input_rate, 0) for off in cfg.offsets_hz]
        )
        ph = jax.device_put(phase0s)

        barrier.wait(timeout=2400)
        t0 = time.time()
        exec_s = 0.0
        for _ in range(iters):
            buf = jax.device_put(wire)
            buf.block_until_ready()  # own-connection transfer, concurrent
            with lock:  # one execution on the chip at a time
                te = time.time()
                flat = fn(buf, ph, car, hf)
                flat.block_until_ready()
                exec_s += time.time() - te
            np.asarray(flat)  # fetch outside the lock
        dt = time.time() - t0
        out_q.put(("ok", widx, {"wall_s": dt, "exec_s": exec_s, "n_in": n_in}))
    except Exception as e:  # noqa: BLE001
        out_q.put(("err", widx, f"{type(e).__name__}: {e}"))
        raise


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--fmt", default="ci4")
    ap.add_argument("--blocks", type=int, default=16,
                    help="demod blocks per device call (call size)")
    args = ap.parse_args()

    ctx = mp.get_context("spawn")
    lock = ctx.Lock()
    barrier = ctx.Barrier(args.workers)
    out_q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_worker,
            args=(w, args.workers, args.fmt, args.iters, args.blocks, lock,
                  barrier, out_q),
            daemon=True,
        )
        for w in range(args.workers)
    ]
    for p in procs:
        p.start()
    results, errors = [], []
    for _ in range(args.workers):
        kind, widx, payload = out_q.get(timeout=2400)
        (results if kind == "ok" else errors).append((widx, payload))
    for p in procs:
        p.join(timeout=60)
    if errors:
        print(json.dumps({"errors": [str(e)[:200] for e in errors]}))
        return 1
    n_in = results[0][1]["n_in"]
    wall = max(r["wall_s"] for _, r in results)
    total = n_in * args.iters * args.workers
    print(
        json.dumps(
            {
                "workers": args.workers,
                "fmt": args.fmt,
                "blocks": args.blocks,
                "iters_per_worker": args.iters,
                "wall_s": round(wall, 3),
                "agg_msps": round(total / wall / 1e6, 2),
                "per_worker_exec_s": [
                    round(r["exec_s"] / args.iters, 4) for _, r in results
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
