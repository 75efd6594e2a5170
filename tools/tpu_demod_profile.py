#!/usr/bin/env python
"""Probe: sub-stage device-exec split of the burst-demod half.

tools/tpu_exec_profile.py showed the demod stage is ~1/3 of the
wideband exec at 64-block calls; this probe splits it further to find
the next kernel target.  With device-resident channelized input
(n_chan, n48) it times prefix pipelines of the exact demod chain in
pipeline/receiver.py:make_burst_demod:

  frame    — overlap framing + flatten to (B, block_len)
  agc      — feedforward AGC
  afc      — square-and-FFT carrier sync (derotate + per-chunk est)
  mf       — preamble matched filter
  detect   — NMS burst detection (vmap)
  extract  — lattice windows + one-hot MXU gather + derotation
  symbols  — feedforward timing + symbol sampling (vmap)
  tail     — quad demod + slicer + record assembly + wire pack

Each stage timed by differencing prefix medians, as in
tpu_exec_profile.py.  ONE probe per process (CLAUDE.md protocol).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--blocks", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from ais_tpu.ops.agc import feedforward_agc
    from ais_tpu.ops.demod import quadrature_demod, slice_diff_invert
    from ais_tpu.ops.framing import frame_overlap, frame_overlap_big
    from ais_tpu.ops.freq import square_and_fft_sync
    from ais_tpu.pipeline.receiver import (
        BURST_GRID,
        burst_table_geometry,
    )
    from ais_tpu.pipeline.wideband import (
        WidebandConfig,
        num_taps,
        wideband_geometry,
    )
    from ais_tpu.sync.corr import autocorr_threshold, detect_bursts, matched_filter
    from ais_tpu.sync.feedforward import feedforward_symbols
    from ais_tpu.tx.gmsk import preamble_waveform

    wcfg = WidebandConfig()
    n48 = wcfg.block_len + wcfg.core_len * (args.blocks - 1)
    n_in = (n48 - 1) * wcfg.decimation + num_taps(wcfg)
    align = int(np.lcm(wcfg.decimation, 4))
    n_in = -(-n_in // align) * align
    n_chan, n_blocks, core_len = wideband_geometry(wcfg, n_in)
    cfg = dataclasses.replace(wcfg.demod, samples_per_symbol=wcfg.sps)
    block_len = wcfg.block_len
    halo = block_len - core_len
    sps_int = int(round(cfg.samples_per_symbol))
    wf = preamble_waveform(sps_int, cfg.gmsk_bt)
    thresh = autocorr_threshold(wf, cfg.resolved_corr_threshold)
    win_len, n_sym = burst_table_geometry(cfg)
    fs = cfg.sample_rate
    grid = BURST_GRID
    K = cfg.max_bursts_per_block
    fftlen = cfg.fftlen

    rng = np.random.default_rng(0)
    planes = rng.normal(size=(n_chan, n48, 2)).astype(np.float32) * 0.25
    chans_host = planes  # float planes; complex can't cross the boundary
    chans_dev = jax.device_put(chans_host)

    def to_cplx(p):
        return jax.lax.complex(p[..., 0], p[..., 1])

    def framed(p):
        chans = to_cplx(p)
        pad = (n_blocks + 1) * core_len - chans.shape[-1]
        if pad > 0:
            chans = jnp.concatenate(
                [chans, jnp.zeros((n_chan, pad), chans.dtype)], axis=-1
            )
        blocks = frame_overlap(
            chans[..., : (n_blocks + 1) * core_len], core_len, halo
        )[..., :n_blocks, :block_len]
        return blocks.reshape(n_chan * n_blocks, block_len)

    def upto_agc(p):
        return feedforward_agc(framed(p), cfg.agc_window, cfg.agc_reference)

    def upto_afc(p):
        a = upto_agc(p)
        y, est = square_and_fft_sync(
            a, fs, cfg.bit_rate, fftlen, gate_ratio=cfg.afc_gate_ratio
        )
        return a, y, est

    def upto_mf(p):
        a, y, est = upto_afc(p)
        return a, est, matched_filter(y, wf)

    def upto_detect(p):
        a, est, corr = upto_mf(p)
        pos, centers, phases, mags, valid, n_det = jax.vmap(
            lambda c: detect_bursts(c, thresh, cfg.nms_radius, K, core_len)
        )(corr)
        return a, est, pos, centers, phases, mags, valid, n_det

    def upto_extract(p):
        a, est, pos, centers, phases, mags, valid, n_det = upto_detect(p)
        B = a.shape[0]
        wl = cfg.burst_len + grid
        starts = jnp.clip(pos + cfg.corr_mark_delay - 1, 0, block_len - cfg.burst_len)
        win_idx = starts // grid
        n_win = block_len // grid
        windows = frame_overlap_big(a, grid, wl - grid)
        wr = windows.real.reshape(B * n_win, wl)
        wi = windows.imag.reshape(B * n_win, wl)
        flat_widx = (
            win_idx + (jnp.arange(B, dtype=jnp.int32) * n_win)[:, None]
        ).reshape(B * K)
        onehot_w = (
            flat_widx[:, None] == jnp.arange(B * n_win, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        bursts = jax.lax.complex(
            jnp.dot(onehot_w, wr, preferred_element_type=jnp.float32),
            jnp.dot(onehot_w, wi, preferred_element_type=jnp.float32),
        )
        burst_offsets = (starts - win_idx * grid).reshape(B * K)
        chunk_idx = jnp.clip(pos // fftlen, 0, est.shape[-1] - 1)
        onehot = (
            chunk_idx[..., None] == jnp.arange(est.shape[-1], dtype=jnp.int32)
        ).astype(jnp.float32)
        burst_freq = jnp.einsum("bkc,bc->bk", onehot, est).reshape(B * K)
        k = jnp.arange(wl, dtype=jnp.float32)
        carrier_phase = (-2.0 * jnp.pi / fs) * burst_freq[:, None] * k[None, :]
        bursts = bursts * jax.lax.complex(
            jnp.cos(carrier_phase), jnp.sin(carrier_phase)
        )
        return bursts, burst_offsets

    def upto_symbols(p):
        bursts, _ = upto_extract(p)
        symbols, sym_valid = jax.vmap(
            lambda b: feedforward_symbols(
                b,
                cfg.samples_per_symbol,
                n_sym,
                bt=cfg.gmsk_bt,
                seg_len=cfg.ff_seg_len,
                path=cfg.ff_path,
            )
        )(bursts)
        return symbols, sym_valid

    def upto_tail(p):
        symbols, sym_valid = upto_symbols(p)
        soft = quadrature_demod(symbols)
        bits = slice_diff_invert(soft)
        return bits, sym_valid

    def reduce_any(*arrs):
        tot = jnp.float32(0)
        for a in arrs:
            if jnp.iscomplexobj(a):
                tot = tot + jnp.sum(jnp.real(a)) + jnp.sum(jnp.imag(a))
            else:
                tot = tot + jnp.sum(a.astype(jnp.float32))
        return tot

    stages = [
        ("frame", lambda p: reduce_any(framed(p))),
        ("agc", lambda p: reduce_any(upto_agc(p))),
        ("afc", lambda p: reduce_any(*upto_afc(p))),
        ("mf", lambda p: reduce_any(*upto_mf(p))),
        ("detect", lambda p: reduce_any(*upto_detect(p))),
        ("extract", lambda p: reduce_any(*upto_extract(p))),
        ("symbols", lambda p: reduce_any(*upto_symbols(p))),
        ("tail", lambda p: reduce_any(*upto_tail(p))),
    ]
    med = {}
    for name, fn in stages:
        f = jax.jit(fn)
        v = np.asarray(f(chans_dev))  # warm-up compile + consume
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            v = np.asarray(f(chans_dev))
            ts.append(time.time() - t0)
        med[name] = float(np.median(ts))

    names = [n for n, _ in stages]
    split = {"frame_ms": round(med["frame"] * 1e3, 2)}
    for prev, cur in zip(names, names[1:]):
        split[f"{cur}_ms"] = round((med[cur] - med[prev]) * 1e3, 2)
    split["total_ms"] = round(med["tail"] * 1e3, 2)
    print(
        json.dumps(
            {
                "probe": "demod_exec_split",
                "device": str(jax.devices()[0]),
                "lanes": int(n_chan * n_blocks),
                "block_len": block_len,
                **split,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
