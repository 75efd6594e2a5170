"""Quadrature (FM) demodulation and bit slicing.

Equivalents of upstream `analog.quadrature_demod_cf`,
`digital.binary_slicer_fb`, `digital.diff_decoder_bb(2)` and the in-repo
`ais.invert` (reference: python/ais_demod.py:48-52, lib/invert_impl.cc:54-68),
fused into two vector ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quadrature_demod(x: jax.Array, gain: float = jnp.pi / 2) -> jax.Array:
    """out[n] = gain * arg(x[n] * conj(x[n-1])); out[0] uses x[-1]=x[0].

    Reference instantiates gain = pi/2 (python/ais_demod.py:48-49).
    """
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    d = x * jnp.conj(prev)
    return gain * jnp.arctan2(d.imag, d.real)


def slice_diff_invert(soft: jax.Array) -> jax.Array:
    """Soft FM output -> NRZI-decoded bits.

    slicer: bit = soft > 0; diff-decode mod 2: d[n] = b[n] ^ b[n-1];
    invert: out = 1 - d (reference: python/ais_demod.py:50-52,
    lib/invert_impl.cc:62-64).  First bit uses b[-1] = b[0] (yields 1),
    harmless before the training sequence.
    """
    b = (soft > 0).astype(jnp.uint8)
    prev = jnp.concatenate([b[..., :1], b[..., :-1]], axis=-1)
    return (1 - (b ^ prev)).astype(jnp.uint8)
