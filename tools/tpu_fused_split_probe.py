#!/usr/bin/env python
"""Probe: per-stage split of the BENCHED fused cr1 wire program.

tools/tpu_exec_profile.py splits the XLA (unfused) formulation; the
bench runs the fused Pallas wire kernel + demod + pack_wire_compact
(pipeline/wideband.py:stage_wire).  This probe prefix-times THAT
program at the bench geometry (bench._geometry: 96 blocks, K=24,
compact_lanes 14*2*blocks):

  p_chan  — fused cr1 bytes -> channels (pallas_wire_channelizer)
  p_demod — p_chan + burst demod
  p_full  — p_chan + demod + pack_wire_compact   (the benched program)
  p_flat  — p_chan + demod + pack_wire_flat      (pre-compaction pack)

Every program reduces its result on device (d2h is a few floats), so
per-call times carry one dispatch overhead each and stage costs come
out of the DIFFERENCES.  ONE probe per process (CLAUDE.md protocol);
all ops are already proven on this backend by the production path.
Prints one JSON line.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--m-mult", type=int, default=1)
    ap.add_argument("--stages", default="chan,demod,full,flat",
                    help="comma subset of chan,demod,full,flat")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import bench
    from ais_tpu.ops.convert import cr1_wire_nbytes
    from ais_tpu.ops.fir import mixer_phase
    from ais_tpu.ops.firdes import low_pass
    from ais_tpu.ops.pallas_fir import (
        pallas_wire_channelizer,
        wire_channelizer_buffers,
    )
    from ais_tpu.pipeline.wideband import (
        make_wideband_fns,
        pack_wire_compact,
        pack_wire_flat,
    )

    cfg, n_in = bench._geometry()
    align = int(np.lcm(cfg.decimation, 8))
    n_in = -(-n_in // align) * align
    taps = low_pass(1.0, cfg.input_rate, cfg.cutoff_hz, cfg.transition_hz)
    _chan, demod = make_wideband_fns(cfg, n_in)
    wc, wh = wire_channelizer_buffers(
        "cr1", taps, cfg.decimation, cfg.offsets_hz, cfg.input_rate,
        m_mult=args.m_mult,
    )
    wc, wh = jax.device_put(wc), jax.device_put(wh)

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.integers(0, 256, cr1_wire_nbytes(n_in), dtype=np.uint8)
    )
    ph = jnp.asarray(
        np.stack(
            [mixer_phase(o, cfg.input_rate, 12345) for o in cfg.offsets_hz]
        )
    )

    def chan(r, p):
        return pallas_wire_channelizer(
            r, p, wc, wh, fmt="cr1", ntaps=taps.size,
            decim=cfg.decimation, offsets=cfg.offsets_hz,
            rate=cfg.input_rate, n_in=n_in, m_mult=args.m_mult,
        )

    def reduce_tree(t):
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(t)
        )

    fns = {
        "chan": jax.jit(
            lambda r, p, _c=chan: (
                lambda y: jnp.sum(jnp.real(y) * jnp.imag(y))
            )(_c(r, p))
        ),
        "demod": jax.jit(
            lambda r, p, _c=chan: reduce_tree(demod(_c(r, p)))
        ),
        "full": jax.jit(
            lambda r, p, _c=chan: jnp.sum(
                pack_wire_compact(
                    demod(_c(r, p)), cfg.demod.fftlen, cfg.compact_lanes
                ).astype(jnp.uint32)
            )
        ),
        "flat": jax.jit(
            lambda r, p, _c=chan: jnp.sum(
                pack_wire_flat(demod(_c(r, p)), cfg.demod.fftlen).astype(
                    jnp.uint32
                )
            )
        ),
    }

    out = {
        "probe": "fused_split", "n_in": n_in, "m_mult": args.m_mult,
        "blocks": int(os.environ.get("AIS_TPU_BENCH_BLOCKS", "96")),
        "compact_lanes": cfg.compact_lanes,
        "device": None,
    }
    want = [s for s in args.stages.split(",") if s]
    try:
        out["device"] = str(jax.devices()[0])
        for name in want:
            fn = fns[name]
            t0 = time.time()
            v = np.asarray(fn(raw, ph))
            out[f"{name}_compile_s"] = round(time.time() - t0, 1)
            assert np.all(np.isfinite(v))
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                np.asarray(fn(raw, ph))
                ts.append(time.time() - t0)
            out[f"{name}_ms"] = round(float(np.median(ts)) * 1e3, 1)
    except Exception as e:  # noqa: BLE001 — the verdict IS the output
        out["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps(out))
        return 1
    if "chan_ms" in out and "demod_ms" in out:
        out["demod_delta_ms"] = round(out["demod_ms"] - out["chan_ms"], 1)
    if "demod_ms" in out and "full_ms" in out:
        out["pack_compact_delta_ms"] = round(
            out["full_ms"] - out["demod_ms"], 1
        )
    if "demod_ms" in out and "flat_ms" in out:
        out["pack_flat_delta_ms"] = round(out["flat_ms"] - out["demod_ms"], 1)
    if "full_ms" in out:
        out["full_ns_per_sample"] = round(out["full_ms"] * 1e6 / n_in, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
