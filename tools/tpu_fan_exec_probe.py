#!/usr/bin/env python
"""Probe: why does the fan observe ~3x the solo per-dispatch exec time?

tools/tpu_fused_split_probe.py measured the WHOLE benched program at
53.7 ms/call (96 blocks, device-resident input, one process) while the
fan's lock-serialized dispatch measures ~158 ms — and a concurrent-h2d
load experiment showed exec latency does NOT inflate under another
connection's transfer stream.  Two client-side suspects remain:

  --mode lazy   (one process) Per step: device_put a FRESH random wire
                buffer, block_until_ready it (the fan's own-connection
                h2d drain, multiproc.py:196), then time the exec alone.
                If exec >> 54 ms, block_until_ready returned before the
                service had the bytes and the exec silently absorbs the
                真 transfer — the fan's h2d_wait phase is fiction.
  --mode duo    (launch TWO instances) Each process compiles its own
                executable of the same program (exactly like fan
                workers) and free-runs execs on device-resident input
                for --seconds.  If per-call inflates vs solo, the
                service pays an executable swap per dispatch when
                alternating between connections' programs.

ONE probe mode per process; all ops proven (production path).  Prints
one JSON line.
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
CACHE_DIR = os.path.join(REPO, ".jax_cache")


def build_full_program():
    """The benched program (fused cr1 chan -> demod -> compact pack),
    reduced on device; same construction as tpu_fused_split_probe."""
    import jax
    import jax.numpy as jnp

    import bench
    from ais_tpu.ops.firdes import low_pass
    from ais_tpu.ops.pallas_fir import (
        pallas_wire_channelizer,
        wire_channelizer_buffers,
    )
    from ais_tpu.pipeline.wideband import make_wideband_fns, pack_wire_compact

    cfg, n_in = bench._geometry()
    align = int(np.lcm(cfg.decimation, 8))
    n_in = -(-n_in // align) * align
    taps = low_pass(1.0, cfg.input_rate, cfg.cutoff_hz, cfg.transition_hz)
    _chan, demod = make_wideband_fns(cfg, n_in)
    wc, wh = wire_channelizer_buffers(
        "cr1", taps, cfg.decimation, cfg.offsets_hz, cfg.input_rate
    )
    wc, wh = jax.device_put(wc), jax.device_put(wh)

    def chan(r, p):
        return pallas_wire_channelizer(
            r, p, wc, wh, fmt="cr1", ntaps=taps.size,
            decim=cfg.decimation, offsets=cfg.offsets_hz,
            rate=cfg.input_rate, n_in=n_in,
        )

    fn = jax.jit(
        lambda r, p: jnp.sum(
            pack_wire_compact(
                demod(chan(r, p)), cfg.demod.fftlen, cfg.compact_lanes
            ).astype(jnp.uint32)
        )
    )
    return fn, cfg, n_in


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["lazy", "duo"], required=True)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--tag", default="")
    ap.add_argument("--start-at", type=float, default=0.0,
                    help="unix time to start the duo measurement window "
                    "(compile first, then wait) — without it the two "
                    "instances' windows may never overlap: a cold cache "
                    "load serializes behind the other instance's run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.ops.convert import cr1_wire_nbytes
    from ais_tpu.ops.fir import mixer_phase

    fn, cfg, n_in = build_full_program()
    nbytes = cr1_wire_nbytes(n_in)
    ph = jnp.asarray(
        np.stack(
            [mixer_phase(o, cfg.input_rate, 12345) for o in cfg.offsets_hz]
        )
    )
    rng = np.random.default_rng(2)

    out = {"probe": "fan_exec", "mode": args.mode, "tag": args.tag,
           "n_in": n_in}
    t0 = time.time()
    warm = jax.device_put(rng.integers(0, 256, nbytes, dtype=np.uint8))
    v = np.asarray(fn(warm, ph))
    assert np.isfinite(v)
    out["compile_s"] = round(time.time() - t0, 1)
    out["device"] = str(jax.devices()[0])

    if args.mode == "lazy":
        # Fresh content per iteration (jax memoizes device_put by host
        # array identity), generated OUTSIDE the timed window.
        waits, execs = [], []
        cpu_w, cpu_e = [], []
        host_bufs = [
            rng.integers(0, 256, nbytes, dtype=np.uint8)
            for _ in range(args.iters)
        ]
        for i in range(args.iters):
            t0, c0 = time.time(), time.process_time()
            staged = jax.device_put(host_bufs[i])
            jax.block_until_ready(staged)
            t1, c1 = time.time(), time.process_time()
            np.asarray(fn(staged, ph))
            t2, c2 = time.time(), time.process_time()
            waits.append(t1 - t0)
            execs.append(t2 - t1)
            cpu_w.append(c1 - c0)
            cpu_e.append(c2 - c1)
            del staged
        out["h2d_wait_ms"] = round(float(np.median(waits)) * 1e3, 1)
        out["exec_ms"] = round(float(np.median(execs)) * 1e3, 1)
        # CPU burned while "waiting": ~= wall means the client spins
        # (poison on a small-core host running many fan workers);
        # ~= 0 means it truly blocks.
        out["h2d_wait_cpu_ms"] = round(float(np.median(cpu_w)) * 1e3, 1)
        out["exec_cpu_ms"] = round(float(np.median(cpu_e)) * 1e3, 1)
        out["wait_implies_mbps"] = round(
            nbytes / max(float(np.median(waits)), 1e-9) / 1e6, 1
        )
    else:  # duo: free-run device-resident execs for --seconds
        if args.start_at:
            out["waited_s"] = round(max(0.0, args.start_at - time.time()), 1)
            while time.time() < args.start_at:
                time.sleep(0.2)
        ts = []
        t_end = time.time() + args.seconds
        while time.time() < t_end:
            t0 = time.time()
            np.asarray(fn(warm, ph))
            ts.append(time.time() - t0)
        out["calls"] = len(ts)
        out["exec_ms_median"] = round(float(np.median(ts)) * 1e3, 1)
        out["exec_ms_p90"] = round(
            float(np.percentile(ts, 90)) * 1e3, 1
        )
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
