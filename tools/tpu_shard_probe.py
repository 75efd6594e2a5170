#!/usr/bin/env python
"""Probe the SHARDED demod programs on the real (tunnel) TPU backend.

Every multi-chip path in ais_tpu/parallel/ is validated on virtual CPU
meshes (unavoidable: one physical chip), but "it lowers on CPU" is weak
evidence on the tunnel backend, whose unimplemented-op minefield is the
reason ARCHITECTURE.md §4 exists (VERDICT r3 weak #7).  This tool runs
the two sharded demod formulations over a ONE-device mesh on the real
chip — the lowering check for shard_map, the sharded gathers, and the
ring ppermute — and cross-checks the records bit-for-bit against the
CPU backend.

Probing protocol (CLAUDE.md): one probe per process.  The parent
launches one subprocess per (backend, mode); a CPU subprocess writes
the reference records, TPU subprocesses compare.

Usage: python tools/tpu_shard_probe.py            # both modes
       python tools/tpu_shard_probe.py --inner cpu:sharded ...
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BLOCK_LEN = 16384
N_BLOCKS = 4
MODES = ("sharded", "ppermute")


def _scene():
    from ais_tpu.core.params import DemodConfig
    from ais_tpu.pipeline.receiver import required_halo
    from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

    cfg = DemodConfig()
    core_len = BLOCK_LEN - required_halo(cfg)
    raw = aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D")
    pkt = make_packet_iq(raw, samples_per_symbol=5)
    n = core_len * N_BLOCKS + BLOCK_LEN
    rng = np.random.default_rng(11)
    iq = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64
    ) * 0.02
    # One packet per core span, plus one straddling a block boundary.
    for b in range(N_BLOCKS):
        at = b * core_len + 2000 + 517 * b
        iq[at : at + pkt.size] += pkt.astype(np.complex64)
    return cfg, core_len, iq


def _blocks(iq, core_len):
    from ais_tpu.ops.cplx import to_planes

    # Frame on host (numpy) so every backend sees identical inputs.
    blocks = np.stack(
        [iq[b * core_len : b * core_len + BLOCK_LEN] for b in range(N_BLOCKS)]
    )
    return to_planes(blocks)  # (N_BLOCKS, BLOCK_LEN, 2) float32


def _cores(iq, core_len):
    from ais_tpu.ops.cplx import to_planes

    cores = np.stack(
        [iq[b * core_len : (b + 1) * core_len] for b in range(N_BLOCKS)]
    )
    return to_planes(cores)  # (N_BLOCKS, core_len, 2) float32


def _inner(spec: str, out_path: str, ref_path: str | None) -> int:
    backend, mode = spec.split(":")
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from ais_tpu.parallel.pipeline import (
        make_halo_exchange_demod,
        make_sharded_demod,
    )

    cfg, core_len, iq = _scene()
    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]).reshape(1), ("time",))
    print(f"[{spec}] device={dev}", flush=True)

    if mode == "sharded":
        fn = make_sharded_demod(cfg, BLOCK_LEN, core_len, mesh)
        x = _blocks(iq, core_len)
    else:
        fn = make_halo_exchange_demod(cfg, BLOCK_LEN, core_len, mesh, N_BLOCKS)
        x = _cores(iq, core_len)

    rec = fn(x)
    rec_np = jax.tree.map(np.asarray, rec)  # consume: surfaces lazy errors
    n_valid = int(rec_np.valid.sum())
    print(f"[{spec}] ok: {n_valid} valid bursts", flush=True)

    # Host-decode every block's records to NMEA: packet-set identity is
    # the probe's pass criterion (what a user of the receiver observes).
    from ais_tpu.pipeline.host import decode_block_records

    sentences = []
    for b in range(rec_np.valid.shape[0]):
        blk = jax.tree.map(lambda a, b=b: a[b], rec_np)
        for p in decode_block_records(blk, block_start_sample=b * core_len):
            sentences.append(f"{p.abs_sample}:{p.nmea}")
    sentences.sort()
    leaves = {
        "bits": rec_np.bits,
        "bit_valid": rec_np.bit_valid,
        "valid": rec_np.valid,
        "position": rec_np.position,
        "packets": np.array(sentences),
    }
    np.savez(out_path, **leaves)
    if ref_path:
        ref = np.load(ref_path)
        if "packets" not in ref:
            print(
                f"[{spec}] reference {ref_path} predates the packet-set "
                f"criterion (no 'packets' key) — regenerate the CPU "
                f"reference with this probe version"
            )
            return 1
        # Pass criterion: the record table (valid/position) and the
        # DECODED PACKET SET must match exactly — that's what a user of
        # the receiver observes.  Raw bit planes are informational only:
        # cells past the frame's closing flag (still inside the fixed
        # extraction window, so bit_valid=1) hold channel noise sliced to
        # bits, where TPU matmul accumulation order legitimately differs
        # from CPU.
        for k in ("valid", "position"):
            if not np.array_equal(ref[k], leaves[k]):
                diff = int(np.sum(ref[k] != leaves[k]))
                print(f"[{spec}] MISMATCH vs CPU in {k}: {diff} cells")
                return 1
        if not np.array_equal(ref["packets"], leaves["packets"]):
            print(f"[{spec}] PACKET MISMATCH vs CPU:")
            print(f"  cpu: {list(ref['packets'])}")
            print(f"  tpu: {list(leaves['packets'])}")
            return 1
        bmask = ref["valid"].astype(bool)[..., None] & ref["bit_valid"].astype(bool)
        stray = int(np.sum((ref["bits"] != leaves["bits"]) & bmask))
        print(
            f"[{spec}] packet set identical to CPU "
            f"({len(sentences)} packets; {stray}/{int(bmask.sum())} "
            f"window bit cells differ past frame flags)",
            flush=True,
        )
    return 0


def main() -> int:
    if "--inner" in sys.argv:
        i = sys.argv.index("--inner")
        return _inner(sys.argv[i + 1], sys.argv[i + 2],
                      sys.argv[i + 3] if len(sys.argv) > i + 3 else None)

    td = tempfile.mkdtemp(prefix="shard_probe_")
    rc = 0
    for mode in MODES:
        ref = os.path.join(td, f"cpu_{mode}.npz")
        r = subprocess.run(
            [sys.executable, __file__, "--inner", f"cpu:{mode}", ref],
            timeout=900,
        )
        if r.returncode:
            print(f"cpu:{mode} failed rc={r.returncode}")
            rc = 1
            continue
        out = os.path.join(td, f"tpu_{mode}.npz")
        r = subprocess.run(
            [sys.executable, __file__, "--inner", f"tpu:{mode}", out, ref],
            timeout=1800,
        )
        if r.returncode:
            print(f"tpu:{mode} FAILED rc={r.returncode}")
            rc = 1
        else:
            print(f"tpu:{mode} PASSED (identical packet set vs CPU)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
