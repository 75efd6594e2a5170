#!/usr/bin/env python
"""Probe: fused Pallas wire channelizer on the real tunnel TPU.

Validates `ops/pallas_fir.py:pallas_wire_channelizer` (packed integer
bytes -> decode -> mix -> polyphase in ONE Mosaic pass) against the
two-stage XLA path (`iq_from_bytes_*` + `freq_xlating_polyphase`) on
device, at the production wideband geometry.  ONE probe per process
(CLAUDE.md protocol); outputs consumed.  Prints one JSON line with a
correctness verdict and per-call medians for both formulations.
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
    ap.add_argument("--fmt", default="ci2")
    ap.add_argument("--n-in", type=int, default=9_633_750 // 50 * 50)
    ap.add_argument("--m-mult", type=int, default=1,
                    help="cr1 output-tile multiplier (pallas_fir)")
    ap.add_argument("--pallas-only", action="store_true",
                    help="skip the XLA cross-check (its full-length "
                    "carrier planes are ~16 bytes/sample of host->device "
                    "transfer — minutes at production n_in; use the "
                    "default two-sided run at small n_in for parity, "
                    "this mode at production n_in for timing)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.ops.cplx import to_planes
    from ais_tpu.ops.convert import (
        host_bytes,
        iq_from_bytes_ci1,
        iq_from_bytes_ci2,
        iq_from_bytes_ci4,
        iq_from_bytes_cr1,
    )
    from ais_tpu.ops.fir import (
        _mixer_carrier,
        freq_xlating_polyphase,
        mixer_phase,
        polyphase_spectra,
    )
    from ais_tpu.ops.firdes import low_pass
    from ais_tpu.ops.pallas_fir import (
        pallas_wire_channelizer,
        wire_channelizer_buffers,
        wire_channelizer_supported,
    )

    rate, decim, offsets = 2.4e6, 50, (-25e3, 25e3)
    taps = low_pass(1.0, rate, 11e3, 2e3)
    n_in = int(args.n_in - (args.n_in % int(np.lcm(decim, 8))))
    n_out = n_in // decim - (-(-taps.size // decim)) + 1
    assert wire_channelizer_supported(args.fmt, taps.size, decim, offsets, rate)
    conv = {
        "ci1": iq_from_bytes_ci1,
        "ci2": iq_from_bytes_ci2,
        "ci4": iq_from_bytes_ci4,
        "cr1": lambda r: iq_from_bytes_cr1(r, n_in),
    }[args.fmt]

    rng = np.random.default_rng(0)
    iq = ((rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3).astype(
        np.complex64
    )
    raw = jax.device_put(host_bytes(iq, args.fmt))
    phase0s = np.stack([mixer_phase(o, rate, 12345) for o in offsets])
    ph = jnp.asarray(phase0s)

    if not args.pallas_only:
        carriers = jax.device_put(
            to_planes(
                np.concatenate([_mixer_carrier(o, rate, n_in) for o in offsets])
            )
        )
        hf = jax.device_put(to_planes(polyphase_spectra(taps, decim, n_out)))
    wc, wh = wire_channelizer_buffers(args.fmt, taps, decim, offsets, rate,
                                      m_mult=args.m_mult)
    wc, wh = jax.device_put(wc), jax.device_put(wh)

    # Reduce outputs on device so the d2h fetch is negligible; consume.
    @jax.jit
    def run_xla(r, p):
        y = freq_xlating_polyphase(conv(r), carriers, p, taps, decim, hf)
        return jnp.stack([jnp.sum(jnp.real(y) * jnp.imag(y)),
                          jnp.sum(jnp.abs(y) ** 2)])

    @jax.jit
    def run_pallas(r, p):
        y = pallas_wire_channelizer(
            r, p, wc, wh, fmt=args.fmt, ntaps=taps.size, decim=decim,
            offsets=offsets, rate=rate, n_in=n_in, m_mult=args.m_mult,
        )
        return jnp.stack([jnp.sum(jnp.real(y) * jnp.imag(y)),
                          jnp.sum(jnp.abs(y) ** 2)])

    out = {"probe": "pallas_wire_channelizer", "fmt": args.fmt, "n_in": n_in,
           "m_mult": args.m_mult}
    t0 = time.time()
    try:
        vp = np.asarray(run_pallas(raw, ph))
        out["pallas_compile_s"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001 — the verdict IS the output
        out["pallas"] = "failed"
        out["error"] = f"{type(e).__name__}: {str(e)[:400]}"
        print(json.dumps(out))
        return 1
    out["device"] = str(jax.devices()[0])
    if args.pallas_only:
        assert np.all(np.isfinite(vp))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            np.asarray(run_pallas(raw, ph))
            ts.append(time.time() - t0)
        out["pallas_ms"] = round(float(np.median(ts)) * 1e3, 1)
        out["pallas_ns_per_sample"] = round(
            out["pallas_ms"] * 1e6 / n_in, 3
        )
        out["pallas"] = "ok"
        print(json.dumps(out))
        return 0
    t0 = time.time()
    vx = np.asarray(run_xla(raw, ph))
    out["xla_compile_s"] = round(time.time() - t0, 1)

    rel = float(np.max(np.abs(vp - vx) / (np.abs(vx) + 1e-9)))
    out["reduced_rel_err_vs_xla"] = round(rel, 7)

    for name, fn in (("pallas", run_pallas), ("xla", run_xla)):
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            np.asarray(fn(raw, ph))
            ts.append(time.time() - t0)
        out[f"{name}_ms"] = round(float(np.median(ts)) * 1e3, 1)
    out["speedup"] = round(out["xla_ms"] / out["pallas_ms"], 2)
    out["pallas"] = "ok" if rel < 1e-3 else "wrong-result"
    print(json.dumps(out))
    return 0 if out["pallas"] == "ok" else 1


if __name__ == "__main__":
    sys.exit(main())
