#!/usr/bin/env python
"""Phase breakdown of the TPU wire path: h2d / exec / d2h-fetch / host.

Run as a standalone process (the tunnel backend's probing protocol —
CLAUDE.md): every op used here is already proven on the backend; this
only times them.  Prints one JSON line.

Usage: python tools/tpu_phase_probe.py [--blocks N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fmt", default="ci8")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        __file__.rsplit("/tools/", 1)[0] + "/.jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.ops.convert import host_bytes
    from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps

    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len * (args.blocks - 1)
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    rx = WidebandReceiver(cfg, n_in=n_in)
    n_in = rx.n_in

    rng = np.random.default_rng(0)
    iq = (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)).astype("complex64")
    wire = host_bytes((iq * 0.05).astype("complex64"), args.fmt)

    dev = str(jax.devices()[0])
    out = {"backend": dev, "n_in": n_in, "wire_mb": wire.nbytes / 1e6}

    # Warm-up / compile.
    t0 = time.time()
    rx.decode_wire(wire, args.fmt)
    out["first_call_s"] = round(time.time() - t0, 2)

    # Phase 1: h2d alone.
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        buf = jax.device_put(wire)
        buf.block_until_ready()
        ts.append(time.time() - t0)
    out["h2d_s"] = round(min(ts), 4)
    out["h2d_mb_s"] = round(wire.nbytes / 1e6 / min(ts), 1)

    # Phase 2: exec with input already on device.
    fn = rx._wire_fns[args.fmt]
    car, hf = getattr(rx, "_wire_bufs", {}).get(
        args.fmt, (rx._carriers, rx._hf)
    )
    from ais_tpu.ops.fir import mixer_phase

    phase0s = np.stack(
        [mixer_phase(off, cfg.input_rate, 0) for off in cfg.offsets_hz]
    )
    ph = jax.device_put(phase0s)
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        flat = fn(buf, ph, car, hf)
        flat.block_until_ready()
        ts.append(time.time() - t0)
    out["exec_s"] = round(min(ts), 4)

    # Phase 3: d2h fetch of the flat record.
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        rec = np.asarray(flat)
        ts.append(time.time() - t0)
    out["fetch_s"] = round(min(ts), 4)
    out["fetch_mb"] = round(rec.nbytes / 1e6, 3)

    # Phase 4: end-to-end decode_wire steady state.
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        rx.decode_wire(wire, args.fmt)
        ts.append(time.time() - t0)
    out["e2e_s"] = round(min(ts), 4)
    out["e2e_msps"] = round(n_in / min(ts) / 1e6, 2)

    # Phase 5: depth-2 pipelined steady state (bench's loop shape).
    t0 = time.time()
    pending = [rx.submit_wire(wire, args.fmt), rx.submit_wire(wire, args.fmt)]
    done = 0
    iters = max(args.iters, 4)
    while pending:
        rx.collect(pending.pop(0))
        done += 1
        if done + len(pending) < iters:
            pending.append(rx.submit_wire(wire, args.fmt))
    dt = (time.time() - t0) / iters
    out["pipelined_s_per_call"] = round(dt, 4)
    out["pipelined_msps"] = round(n_in / dt / 1e6, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
