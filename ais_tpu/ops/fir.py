"""Batched FIR filtering / frequency-translating channelizer.

TPU-native equivalent of upstream `filter.freq_xlating_fir_filter_ccf`
(reference: python/radio.py:51-54): mix the wideband stream down by the
channel offset, low-pass filter, and decimate — but over `(batch, time)`
tensor blocks instead of a sample stream.  The FIR runs as a strided
`lax.conv_general_dilated`, which XLA tiles onto the MXU; the mixer
carrier is a trace-time constant (numpy float64 phase accumulation, so no
float32 phase drift over long blocks) rotated per-block by a scalar.

Convention: `y[n] = sum_k taps[k] * x[n*decim + k]` over VALID samples
only — callers supply `taps.size - 1` halo samples.  Taps are applied
un-reversed; the designs used here are symmetric so this matches the
reference's dot-product direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fir_filter(x: jax.Array, taps: np.ndarray, decim: int = 1) -> jax.Array:
    """Strided VALID FIR of complex input with real taps.

    x: (..., n) complex64;  returns (..., (n - ntaps)//decim + 1).
    """
    ntaps = int(np.asarray(taps).size)
    taps_f = jnp.asarray(np.asarray(taps, dtype=np.float32)).reshape(1, 1, ntaps)
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    # real/imag as independent batch rows through one real conv.
    xr = jnp.stack([x.real, x.imag], axis=-2).reshape(-1, 1, n)
    out = jax.lax.conv_general_dilated(
        xr.astype(jnp.float32),
        taps_f,
        window_strides=(decim,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    n_out = out.shape[-1]
    out = out.reshape(*batch_shape, 2, n_out)
    return jax.lax.complex(out[..., 0, :], out[..., 1, :])


@functools.lru_cache(maxsize=32)
def _mixer_carrier(offset_hz: float, sample_rate: float, length: int) -> np.ndarray:
    """e^{-j 2 pi f n / fs} for n in [0, length), float64-accurate."""
    n = np.arange(length, dtype=np.float64)
    phase = -2.0 * np.pi * (offset_hz / sample_rate) * n
    return np.exp(1j * np.remainder(phase, 2.0 * np.pi)).astype(np.complex64)


def mixer_phase(offset_hz: float, sample_rate: float, start_sample) -> np.ndarray:
    """Starting phase (radians) of the down-mixer at absolute sample index.

    Host-side float64 so multi-block streaming keeps a phase-continuous
    carrier, like the reference's single rotator does implicitly.
    """
    start = np.asarray(start_sample, dtype=np.float64)
    return np.remainder(-2.0 * np.pi * (offset_hz / sample_rate) * start, 2.0 * np.pi).astype(
        np.float32
    )


def freq_xlating_fir_decimate(
    x: jax.Array,
    taps: np.ndarray,
    offset_hz: float,
    sample_rate: float,
    decim: int,
    phase0: jax.Array | float = 0.0,
) -> jax.Array:
    """Mix `x` down by `offset_hz`, low-pass with `taps`, decimate.

    x: (..., n) complex64. phase0: scalar or (batch,) carrier start phase
    (from `mixer_phase`).  Output: (..., (n - ntaps)//decim + 1).
    """
    n = x.shape[-1]
    carrier = jnp.asarray(_mixer_carrier(offset_hz, sample_rate, n))
    rot = jnp.exp(1j * jnp.asarray(phase0, dtype=jnp.float32)).astype(jnp.complex64)
    if jnp.ndim(rot):
        rot = rot.reshape(rot.shape + (1,) * (x.ndim - rot.ndim))
    mixed = x * carrier * rot
    return fir_filter(mixed, taps, decim)
