"""Feedforward burst AGC.

Equivalent of upstream `analog.feedforward_agc_cc(nsamples=512, reference=2)`
(reference: python/ais_demod.py:35): every output sample is the input
scaled so that the peak envelope over the `nsamples` window *ahead* of it
equals the reference level.  Critical for bursty AIS — the gain snaps to
the burst amplitude before the burst arrives instead of averaging over
silence.

The reference computes the window max per-sample (O(n*w) C++ loop); here
it is a logarithmic shift-doubling sliding max (ops/window.py) — pure
elementwise VPU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ais_tpu.ops.window import sliding_max_forward


def feedforward_agc(
    x: jax.Array,
    window: int = 512,
    reference: float = 2.0,
    floor: float = 1e-12,
) -> jax.Array:
    """x: (..., n) complex. Returns x * reference / lookahead_env_max.

    At the block tail the lookahead window shrinks; callers keep bursts
    out of the last `window` samples via halo framing.
    """
    mag = jnp.abs(x)
    env = sliding_max_forward(mag, window)
    gain = reference / jnp.maximum(env, floor)
    return x * gain.astype(x.real.dtype)
