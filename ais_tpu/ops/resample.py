"""Polyphase arbitrary-rate resampler.

Equivalent of upstream `filter.pfb.arb_resampler_ccf`, the resampler-based
channel topology the reference's development flowgraph prefers
(reference: python/ais.grc:1523 — pfb_arb_resampler_ccf with
rrate = 9600*5/samp_rate, 32-filter low_pass_2 prototype; also the
commented-out path at python/radio.py:55).

Design: a prototype low-pass sampled at `nfilts` x the input rate is
split into `nfilts` phase banks; output sample k sits at input position
k/rate, its fractional part selects a bank, and (like GNU Radio's
two-bank scheme) the value is linearly interpolated between adjacent
banks.  Here the whole output grid is computed at once: one gather of
(n_out, taps_per_phase) input frames, two bank lookups, one batched dot.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ais_tpu.ops.firdes import low_pass


@functools.lru_cache(maxsize=16)
def default_prototype(nfilts: int = 32, attenuation_frac: float = 0.4) -> np.ndarray:
    """Prototype low-pass for near-unity resampling rates.

    Cutoff at `attenuation_frac` of the input Nyquist (in the nfilts-
    upsampled domain), unity DC gain per phase (gain = nfilts overall).
    """
    return low_pass(
        float(nfilts),
        float(nfilts),
        attenuation_frac,
        0.1,
    )


def polyphase_bank(taps: np.ndarray, nfilts: int) -> np.ndarray:
    """(nfilts, taps_per_phase) bank; bank[p] = taps[p::nfilts]."""
    taps = np.asarray(taps, dtype=np.float32)
    tpp = -(-taps.size // nfilts)
    padded = np.zeros(tpp * nfilts, dtype=np.float32)
    padded[: taps.size] = taps
    return padded.reshape(tpp, nfilts).T.copy()


def pfb_arb_resample(
    x: jax.Array,
    rate: float,
    taps: np.ndarray | None = None,
    nfilts: int = 32,
) -> jax.Array:
    """Resample x by `rate` (out_rate / in_rate).

    x: (n,) complex64 or float32.  Output length floor((n - tpp) * rate).
    """
    if taps is None:
        taps = default_prototype(nfilts)
    bank = polyphase_bank(taps, nfilts)
    tpp = bank.shape[1]
    n = x.shape[-1]
    n_out = int(np.floor((n - tpp) * rate))
    if n_out <= 0:
        raise ValueError(f"input of {n} samples too short to resample")

    # Output k reads input frame starting at floor(k/rate); the fractional
    # part picks (and interpolates between) phase banks.
    pos = np.arange(n_out, dtype=np.float64) / rate
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    phase_f = frac * nfilts
    p0 = np.floor(phase_f).astype(np.int64)
    w = (phase_f - p0).astype(np.float32)
    p1 = np.minimum(p0 + 1, nfilts - 1)
    # When p0+1 would wrap to the next input sample, GR advances the frame
    # instead; clamping the bank is within the linear-interp error budget
    # at 32 filters and keeps the gather static-shaped.

    frames = x[jnp.asarray(base)[:, None] + jnp.arange(tpp)[None, :]]
    c0 = jnp.asarray(bank)[jnp.asarray(p0)]
    c1 = jnp.asarray(bank)[jnp.asarray(p1)]
    coeffs = c0 * (1.0 - jnp.asarray(w))[:, None] + c1 * jnp.asarray(w)[:, None]
    return jnp.sum(frames * coeffs, axis=-1)
