"""On-device integer-IQ conversion.

SDRs emit interleaved integer IQ (int16/int8/uint8); converting on the
host and shipping complex64 wastes 2-4x host->device bandwidth — at
production rates the ingest link, not the compute, bounds throughput.
These kernels take the raw bytes (uint8 view, since the tunnel backend
rejects int16 transfers) and reconstruct complex64 on device with pure
arithmetic.

Reference analogue: the source blocks' format handling
(python/radio.py:151-215) always lands in host-side fc32; here the
conversion is part of the device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def iq_from_bytes_ci16(raw_u8: jax.Array, scale: float = 1.0 / 32768.0) -> jax.Array:
    """(4n,) uint8 little-endian int16 interleaved IQ -> (n,) complex64."""
    n4 = raw_u8.shape[-1]
    v = raw_u8.astype(jnp.int32).reshape(n4 // 4, 4)
    lo_i, hi_i, lo_q, hi_q = v[:, 0], v[:, 1], v[:, 2], v[:, 3]

    def to_i16(lo, hi):
        u = lo + hi * 256
        return u - 65536 * (u >= 32768)

    re = to_i16(lo_i, hi_i).astype(jnp.float32) * scale
    im = to_i16(lo_q, hi_q).astype(jnp.float32) * scale
    return jax.lax.complex(re, im)


def iq_from_bytes_ci8(raw_u8: jax.Array, scale: float = 1.0 / 128.0) -> jax.Array:
    """(2n,) uint8 holding int8 interleaved IQ -> (n,) complex64."""
    v = raw_u8.astype(jnp.int32)
    v = v - 256 * (v >= 128)
    v = v.reshape(v.shape[-1] // 2, 2).astype(jnp.float32) * scale
    return jax.lax.complex(v[:, 0], v[:, 1])


def iq_from_bytes_cu8(raw_u8: jax.Array) -> jax.Array:
    """(2n,) uint8 offset-binary (rtl_sdr) interleaved IQ -> (n,) complex64."""
    v = (raw_u8.astype(jnp.float32) - 127.5) * (1.0 / 127.5)
    v = v.reshape(v.shape[-1] // 2, 2)
    return jax.lax.complex(v[:, 0], v[:, 1])


def host_bytes(iq: np.ndarray, fmt: str) -> np.ndarray:
    """Encode complex64 IQ into the uint8 wire view for tests/benches."""
    if fmt in ("ci16", "cs16"):
        i = np.round(np.clip(iq.real, -1, 1 - 1 / 32768) * 32768).astype("<i2")
        q = np.round(np.clip(iq.imag, -1, 1 - 1 / 32768) * 32768).astype("<i2")
        out = np.empty(iq.size * 2, dtype="<i2")
        out[0::2] = i
        out[1::2] = q
        return out.view(np.uint8)
    if fmt in ("ci8", "cs8"):
        i = np.round(np.clip(iq.real, -1, 1 - 1 / 128) * 128).astype(np.int8)
        q = np.round(np.clip(iq.imag, -1, 1 - 1 / 128) * 128).astype(np.int8)
        out = np.empty(iq.size * 2, dtype=np.int8)
        out[0::2] = i
        out[1::2] = q
        return out.view(np.uint8)
    if fmt == "cu8":
        i = np.round(np.clip(iq.real, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        q = np.round(np.clip(iq.imag, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        out = np.empty(iq.size * 2, dtype=np.uint8)
        out[0::2] = i
        out[1::2] = q
        return out
    raise ValueError(f"unsupported format {fmt!r}")
