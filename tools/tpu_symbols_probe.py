#!/usr/bin/env python
"""Probe: where the feedforward symbols stage spends its device time.

tools/tpu_demod_profile.py showed the symbols stage dominates the demod
half even after the bank-FIR comb replaced the FFT comb.  This probe
times, on a (lanes, win_len) device-resident burst table:

  estimate — estimate_timing vmap (tone segment sums + fit)
  fir      — full feedforward_symbols_fir vmap (estimate + FIR comb)
  fft      — full feedforward_symbols_fft vmap (reference formulation)

ONE probe per process (CLAUDE.md protocol).  Prints one JSON line.
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--win", type=int, default=4608)
    ap.add_argument("--nsym", type=int, default=918)
    ap.add_argument("--skip-fft", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.sync.feedforward import (
        estimate_timing,
        feedforward_symbols_fft,
        feedforward_symbols_fir,
    )

    rng = np.random.default_rng(0)
    planes = rng.normal(size=(args.lanes, args.win, 2)).astype(np.float32) * 0.3
    pl = jax.device_put(planes)

    def cplx(p):
        return jax.lax.complex(p[..., 0], p[..., 1])

    def p_est(p):
        b, i, s = jax.vmap(lambda x: estimate_timing(x, 5.0))(cplx(p))
        return jnp.sum(b) + jnp.sum(i) + jnp.sum(s)

    def p_fir(p):
        s, v = jax.vmap(
            lambda x: feedforward_symbols_fir(x, 5.0, args.nsym)
        )(cplx(p))
        return jnp.sum(jnp.real(s)) + jnp.sum(jnp.imag(s)) + jnp.sum(v)

    def p_fft(p):
        s, v = jax.vmap(
            lambda x: feedforward_symbols_fft(x, 5.0, args.nsym)
        )(cplx(p))
        return jnp.sum(jnp.real(s)) + jnp.sum(jnp.imag(s)) + jnp.sum(v)

    stages = [("estimate", p_est), ("fir", p_fir)]
    if not args.skip_fft:
        stages.append(("fft", p_fft))
    med = {}
    for name, fn in stages:
        f = jax.jit(fn)
        v = np.asarray(f(pl))  # warm-up compile + consume
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            v = np.asarray(f(pl))
            ts.append(time.time() - t0)
        med[name] = round(float(np.median(ts)) * 1e3, 2)

    print(
        json.dumps(
            {
                "probe": "symbols_split",
                "device": str(jax.devices()[0]),
                "lanes": args.lanes,
                "win": args.win,
                **{f"{k}_ms": v for k, v in med.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
