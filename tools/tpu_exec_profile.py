#!/usr/bin/env python
"""Probe: per-stage device-exec split of the wideband program.

Ingest no longer binds alone (the ci2 wire + multi-connection fan cut
transfer time toward the ~45 ms device exec), so the next lever is the
exec itself.  This probe times, with device-resident inputs (no wire
transfer in the measured region):

  convert   — ci2 bytes -> complex64 planes
  channelize — fused mixer+polyphase (both channels)
  demod     — framing + AFC + AGC + correlate + timing + bits
  pack      — record coalescing to the single d2h buffer

Each stage timed by running prefix pipelines (convert; convert+chan;
...) and differencing, medians over --iters runs.  ONE probe per
process (CLAUDE.md protocol).  Prints one JSON line.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--fmt", default="ci2")
    ap.add_argument("--blocks", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.ops.convert import (
        host_bytes,
        iq_from_bytes_ci1,
        iq_from_bytes_ci2,
        iq_from_bytes_ci4,
        iq_from_bytes_ci8,
    )
    from ais_tpu.ops.fir import mixer_phase
    from ais_tpu.pipeline.receiver import burst_table_geometry
    from ais_tpu.pipeline.wideband import (
        WidebandConfig,
        channelizer_buffers,
        channelizer_mode,
        make_wideband_fns,
        num_taps,
        pack_wire_flat,
        wideband_geometry,
    )
    import dataclasses

    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len * (args.blocks - 1)
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    align = int(np.lcm(cfg.decimation, 8))  # 8: cr1 packs 8 samples/byte
    n_in = -(-n_in // align) * align

    from ais_tpu.ops.convert import iq_from_bytes_cr1

    conv = {
        "ci1": iq_from_bytes_ci1,
        "ci2": iq_from_bytes_ci2,
        "ci4": iq_from_bytes_ci4,
        "ci8": iq_from_bytes_ci8,
        "cr1": lambda r: iq_from_bytes_cr1(r, n_in),
    }[args.fmt]
    bytes_per = {"ci1": n_in // 4, "ci2": n_in // 2, "ci4": n_in,
                 "ci8": 2 * n_in, "cr1": -(-n_in // 8)}[args.fmt]

    chan_fn, demod_fn = make_wideband_fns(cfg, n_in)
    demod_cfg = dataclasses.replace(cfg.demod, samples_per_symbol=cfg.sps)
    _, n_sym = burst_table_geometry(demod_cfg)
    fftlen = cfg.demod.fftlen

    _car, _hf = channelizer_buffers(cfg, n_in)
    carriers, hf = jax.device_put(_car), jax.device_put(_hf)
    phase0s = jnp.asarray(
        np.stack([mixer_phase(off, cfg.input_rate, 0) for off in cfg.offsets_hz])
    )

    rng = np.random.default_rng(0)
    iq = (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)).astype(np.complex64)
    iq *= 0.25
    raw = jax.device_put(host_bytes(iq, args.fmt))
    assert raw.size == bytes_per

    # Prefix pipelines.  Outputs reduced to small reals so d2h fetch is
    # negligible and poisoned buffers would surface (consume!).
    def p_convert(r):
        x = conv(r)
        return jnp.sum(jnp.real(x) * jnp.imag(x))

    def p_chan(r):
        ch = chan_fn(conv(r), phase0s, carriers, hf)
        return jnp.sum(jnp.abs(ch) ** 2)

    def p_demod(r):
        rec = demod_fn(chan_fn(conv(r), phase0s, carriers, hf))
        return sum(jnp.sum(jnp.abs(a.astype(jnp.float32))) for a in jax.tree.leaves(rec))

    def p_pack(r):
        rec = demod_fn(chan_fn(conv(r), phase0s, carriers, hf))
        return jnp.sum(pack_wire_flat(rec, fftlen).astype(jnp.float32))

    stages = [("convert", p_convert), ("chan", p_chan), ("demod", p_demod), ("pack", p_pack)]
    med = {}
    out = {}
    for name, fn in stages:
        f = jax.jit(fn)
        v = np.asarray(f(raw))  # warm-up compile + consume
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            v = np.asarray(f(raw))
            ts.append(time.time() - t0)
        med[name] = float(np.median(ts))
        out[name] = float(v)

    split = {
        "convert_ms": round(med["convert"] * 1e3, 1),
        "chan_ms": round((med["chan"] - med["convert"]) * 1e3, 1),
        "demod_ms": round((med["demod"] - med["chan"]) * 1e3, 1),
        "pack_ms": round((med["pack"] - med["demod"]) * 1e3, 1),
        "total_ms": round(med["pack"] * 1e3, 1),
    }
    print(
        json.dumps(
            {
                "probe": "wideband_exec_split",
                "device": str(jax.devices()[0]),
                "fmt": args.fmt,
                "channelizer": channelizer_mode(cfg, n_in),
                "n_in": n_in,
                **split,
                "msps_exec_only": round(n_in / med["pack"] / 1e6, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
