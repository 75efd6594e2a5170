#!/usr/bin/env python
"""Probe: FFT vs MXU vs fused-Pallas matched filter on the real TPU.

Times the three formulations of the burst detector's preamble
correlation (sync/corr.py:matched_filter vs ops/pallas_corr.py) over
the bench geometry (batch of demod blocks), cross-checks peak positions
and |corr|^2 values between them, and also times the FULL demod program
under each corr_path to report the end-to-end exec gain (VERDICT r2
item 9: >= 1.3x exec-only on the demod program).

ONE probe per process (CLAUDE.md protocol); outputs consumed with
np.asarray.

Usage: python tools/tpu_corr_probe.py [--blocks 64] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE_DIR = os.path.join(REPO, ".jax_cache")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.core.params import DemodConfig
    from ais_tpu.ops.pallas_corr import matched_filter_mxu, pallas_matched_filter
    from ais_tpu.pipeline.receiver import make_burst_demod, required_halo
    from ais_tpu.sync.corr import matched_filter
    from ais_tpu.tx.gmsk import preamble_waveform

    backend = str(jax.devices()[0])
    cfg = DemodConfig()
    block_len = 16384
    B = args.blocks
    wf = preamble_waveform(5, cfg.gmsk_bt)

    rng = np.random.default_rng(0)
    x = (
        rng.normal(size=(B, block_len)) + 1j * rng.normal(size=(B, block_len))
    ).astype(np.complex64) * 0.3
    x[:, 4000 : 4000 + wf.size] += wf.astype(np.complex64)
    xr = jnp.asarray(x.real)
    xi = jnp.asarray(x.imag)

    def cplx(r, i):
        return jax.lax.complex(r, i)

    fns = {
        "fft": jax.jit(lambda r, i: jnp.abs(matched_filter(cplx(r, i), wf)) ** 2),
        "mxu": jax.jit(
            lambda r, i: jnp.abs(matched_filter_mxu(cplx(r, i), wf)) ** 2
        ),
        "pallas": jax.jit(
            lambda r, i: pallas_matched_filter(cplx(r, i), wf, with_mag2=True)[1]
        ),
    }

    out = {"probe": "tpu_corr", "backend": backend, "blocks": B}
    mags = {}
    for name, fn in fns.items():
        print(f"[probe] compiling {name} matched filter...", file=sys.stderr, flush=True)
        t0 = time.time()
        m = np.asarray(fn(xr, xi))
        out[f"{name}_compile_plus_first_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        for _ in range(args.iters):
            m = np.asarray(fn(xr, xi))
        out[f"{name}_ms"] = round((time.time() - t0) / args.iters * 1e3, 2)
        mags[name] = m

    peaks = {k: np.argmax(v, axis=-1) for k, v in mags.items()}
    out["peak_positions_match"] = bool(
        (peaks["fft"] == peaks["mxu"]).all()
        and (peaks["fft"] == peaks["pallas"]).all()
    )
    pk = mags["fft"][np.arange(B), peaks["fft"]]
    out["peak_value_max_rel_err"] = {
        k: float(
            np.max(
                np.abs(mags[k][np.arange(B), peaks["fft"]] - pk)
                / np.maximum(pk, 1e-30)
            )
        )
        for k in ("mxu", "pallas")
    }
    out["mf_speedup_vs_fft"] = {
        k: round(out["fft_ms"] / out[f"{k}_ms"], 2) for k in ("mxu", "pallas")
    }

    # Full demod program under each corr_path: the end-to-end exec gain.
    core = block_len - required_halo(cfg)
    planes = jnp.asarray(np.stack([x.real, x.imag], axis=-1))
    demod_ms = {}
    for path in ("fft", "pallas"):
        import dataclasses

        dcfg = dataclasses.replace(cfg, corr_path=path)
        print(f"[probe] compiling demod corr_path={path}...", file=sys.stderr, flush=True)
        fn = jax.jit(make_burst_demod(dcfg, block_len, core))
        rec = jax.tree.map(np.asarray, fn(planes))  # compile + check
        t0 = time.time()
        for _ in range(args.iters):
            rec = jax.tree.map(np.asarray, fn(planes))
        demod_ms[path] = round((time.time() - t0) / args.iters * 1e3, 1)
        out[f"demod_{path}_n_valid"] = int(rec.valid.sum())
    out["demod_ms"] = demod_ms
    out["demod_exec_speedup"] = round(demod_ms["fft"] / demod_ms["pallas"], 2)
    print(json.dumps(out))
    return 0 if out["peak_positions_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
