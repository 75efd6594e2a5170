#!/usr/bin/env python
"""SUSTAINED multi-host streaming decode measurement (BASELINE config 5).

The round-2 scaling number was one 128-block batch; this harness runs a
continuous rolling-call stream (DistributedStreamDecoder: cross-call
carry, absolute positions, persistent deduper, packets straddling call
boundaries) for many device calls on two mesh shapes at equal global
devices:

  1 process  x 8 local devices   (no process boundary)
  2 processes x 4 local devices  (jax.distributed over TCP = DCN path)

and reports SUSTAINED throughput (warmup calls excluded) plus the
efficiency ratio.  Throughput is in channel-rate Msps consumed by the
sharded demod; the input-rate-equivalent column scales by the
wideband channelizer's decimation (50) — per-host channelization is
embarrassingly parallel and measured separately (bench.py), so the
quantity the multi-host layer adds is exactly what this times.

Packet-set equality is asserted between processes AND between mesh
shapes (the straddle packets decode exactly once everywhere).

Usage: python tools/multihost_streaming.py [--calls 120] [--blocks 32]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_stream_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int) -> dict:
    # Curated env: without the axon pool vars sitecustomize does not
    # register the TPU tunnel, so JAX_PLATFORMS=cpu holds.
    return {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "PYTHONPATH": "/root/.axon_site:" + REPO,
        "JAX_PLATFORMS": "cpu",
        "HOME": "/root",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
    }


def run_config(n_procs: int, calls: int, blocks: int, timeout: int = 1800):
    local = 8 // n_procs
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"p{i}.json") for i in range(n_procs)]
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    WORKER,
                    coordinator if n_procs > 1 else "none",
                    str(n_procs),
                    str(i),
                    outs[i],
                    str(calls),
                    str(blocks),
                ],
                env=_env(local),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=REPO,
            )
            for i in range(n_procs)
        ]
        for p in procs:
            _stdout, stderr = p.communicate(timeout=timeout)
            if p.returncode != 0:
                raise RuntimeError(f"worker rc={p.returncode}: {stderr[-2000:]}")
        results = [json.load(open(o)) for o in outs]
    pk = results[0]["packets"]
    for r in results[1:]:
        if r["packets"] != pk:
            raise RuntimeError("processes decoded different packet sets")
    # The slowest process gates the stream.
    msps = min(r["chan_msps"] for r in results)
    return msps, results[0]["sustained_s"], pk


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=120)
    ap.add_argument("--blocks", type=int, default=32)
    args = ap.parse_args()

    m1, t1, pk1 = run_config(1, args.calls, args.blocks)
    m2, t2, pk2 = run_config(2, args.calls, args.blocks)
    if pk1 != pk2:
        raise RuntimeError("1-process and 2-process packet sets differ")
    eff = m2 / m1
    print(
        json.dumps(
            {
                "metric": "multihost_sustained_streaming",
                "sustained_efficiency": round(eff, 3),
                "chan_msps_1proc": round(m1, 2),
                "chan_msps_2proc": round(m2, 2),
                "input_equiv_msps_2proc": round(m2 * 50, 1),
                "sustained_s_1proc": round(t1, 1),
                "sustained_s_2proc": round(t2, 1),
                "calls": args.calls,
                "blocks_per_call": args.blocks,
                "packets_per_run": len(pk1),
                "packets_equal": True,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
