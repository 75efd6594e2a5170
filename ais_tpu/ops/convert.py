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


def iq_from_bytes_ci4(raw_u8: jax.Array, scale: float = 1.0 / 8.0) -> jax.Array:
    """(n,) uint8, each byte = (I << 4) | Q as 4-bit two's complement
    -> (n,) complex64.

    Packed quadrature formats are the standard trick where the ingest
    link — not the ADC — is the bottleneck (VITA-49 payload classes go
    down to 4-bit IQ).  At 4 bits the quantization noise is ~ -22 dB of
    full scale *across the whole wideband capture*; the channelizer's
    50x bandwidth reduction spreads it another ~17 dB down, so per-channel
    post-filter SNR stays >35 dB — far above AIS decode needs
    (content-parity asserted in tests/test_wideband.py).
    """
    v = raw_u8.astype(jnp.int32)
    i = v >> 4
    q = v & 15
    i = i - 16 * (i >= 8)
    q = q - 16 * (q >= 8)
    return jax.lax.complex(
        i.astype(jnp.float32) * scale, q.astype(jnp.float32) * scale
    )


def iq_from_bytes_ci2(raw_u8: jax.Array) -> jax.Array:
    """(n/2,) uint8, each byte = I0 Q0 I1 Q1 as 2-bit codes (MSB-first)
    -> (n,) complex64.  Code c in {0..3} decodes to (c - 1.5)/2, i.e.
    the classic 4-level {-0.75, -0.25, +0.25, +0.75} quantizer."""
    v = raw_u8.astype(jnp.int32)
    f = [(v >> s) & 3 for s in (6, 4, 2, 0)]  # I0 Q0 I1 Q1
    re = jnp.stack([f[0], f[2]], axis=-1).reshape(v.shape[-1] * 2)
    im = jnp.stack([f[1], f[3]], axis=-1).reshape(v.shape[-1] * 2)
    dec = lambda c: (c.astype(jnp.float32) - 1.5) * 0.5  # noqa: E731
    return jax.lax.complex(dec(re), dec(im))


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
    if fmt == "ci4":
        i = np.round(np.clip(iq.real, -1, 1 - 1 / 8) * 8).astype(np.int32) & 15
        q = np.round(np.clip(iq.imag, -1, 1 - 1 / 8) * 8).astype(np.int32) & 15
        return ((i << 4) | q).astype(np.uint8)
    if fmt == "ci2":
        if iq.size % 2:
            raise ValueError("ci2 packs 2 samples/byte: need even sample count")
        # Inverse of iq_from_bytes_ci2: bin edges at -0.5/0/+0.5 FS.
        enc = lambda x: np.clip(  # noqa: E731
            np.floor(x * 2 + 2).astype(np.int32), 0, 3
        )
        i, q = enc(iq.real), enc(iq.imag)
        b = (i[0::2] << 6) | (q[0::2] << 4) | (i[1::2] << 2) | q[1::2]
        return b.astype(np.uint8)
    if fmt == "cu8":
        i = np.round(np.clip(iq.real, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        q = np.round(np.clip(iq.imag, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        out = np.empty(iq.size * 2, dtype=np.uint8)
        out[0::2] = i
        out[1::2] = q
        return out
    raise ValueError(f"unsupported format {fmt!r}")
