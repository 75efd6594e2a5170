"""Polyphase fractional-delay interpolation bank.

Equivalent of GNU Radio's 8-tap, 128-phase MMSE fractional interpolator
used inside the reference's timing recovery
(reference: lib/msk_timing_recovery_cc_impl.h:40, use at
lib/msk_timing_recovery_cc_impl.cc:170).  Same geometry — taps dotted
with x[i .. i+7] approximate the signal at x[i + 3 + mu], mu in [0, 1],
129 quantized phases — but the taps are designed here as a
Blackman-windowed sinc fractional-delay bank (at 5x oversampling the
in-band response is indistinguishable from the MMSE design; parity is
defined on decoded packets, SURVEY.md section 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NTAPS = 8
NSTEPS = 128
DELAY = 3  # interpolation point sits between taps index 3 and 4


@functools.lru_cache(maxsize=4)
def interp_taps(ntaps: int = NTAPS, nsteps: int = NSTEPS) -> np.ndarray:
    """(nsteps + 1, ntaps) float32 bank; row k interpolates mu = k/nsteps."""
    rows = []
    for k in range(nsteps + 1):
        mu = k / nsteps
        t = np.arange(ntaps, dtype=np.float64) - (DELAY + mu)
        h = np.sinc(t)
        # Blackman window centered on the interpolation point.
        span = ntaps / 2.0
        w = np.where(
            np.abs(t) < span,
            0.42 + 0.5 * np.cos(np.pi * t / span) + 0.08 * np.cos(2 * np.pi * t / span),
            0.0,
        )
        h = h * w
        rows.append(h / h.sum())  # unity DC gain
    return np.asarray(rows, dtype=np.float32)


def interpolate(x: jax.Array, index: jax.Array, mu: jax.Array) -> jax.Array:
    """Value of x at fractional position index + DELAY + mu.

    x: (n,) complex64; index: scalar int32; mu: scalar float32 in [0, 1].
    Matches the reference's `d_interp->interpolate(&in[iidx], d_mu)` call
    geometry (lib/msk_timing_recovery_cc_impl.cc:170).
    """
    bank = jnp.asarray(interp_taps())
    imu = jnp.clip(jnp.round(mu * NSTEPS).astype(jnp.int32), 0, NSTEPS)
    taps = jax.lax.dynamic_slice(bank, (imu, 0), (1, NTAPS))[0]
    frame = jax.lax.dynamic_slice(x, (index,), (NTAPS,))
    return jnp.sum(frame * taps)
