"""Pallas/Mosaic fused mixer + polyphase decimating FIR channelizer.

MXU-native formulation of the wideband channelizer (the FLOP-dominant
device stage; reference analogue `filter.freq_xlating_fir_filter_ccf`,
python/radio.py:51-54).  The XLA path (`ops/fir.py:
freq_xlating_polyphase`) computes the polyphase correlation in the
frequency domain — bandwidth-bound batched FFTs over ~nfft*D complex
workspaces.  This kernel instead runs the direct polyphase matmul on the
MXU with each tile staying in VMEM end to end:

  phase-major layout:  Xt[r, j] = x[j*D + r]           (D, n_rows)
  mix:                 Mt = Xt * carrier-tile           (VPU)
  matmul:              Z[p, j] = sum_r H[p, r] Mt[r, j] (MXU, (P,D)@(D,T))
  diagonal collapse:   y[m] = sum_p Z[p, m+p]           (log2 P static
                        lane-rotations + one sublane reduction)

Structural facts exploited:

- Channel offsets are rational vs the input rate (±25 kHz @ 2.4 Msps →
  96-sample period), so the mixer carrier is a tiny periodic tile, not
  an n-length HBM buffer: choosing the output tile M as a multiple of
  the carrier's row-period makes ONE static (D, M+B) carrier block
  correct at every grid step.  The full-length carrier HBM read
  (~150 MB/step) disappears.
- AIS wideband taps (~2.9k) give P = ceil(ntaps/D) = 58 ≤ 64 phase
  rows: the anti-diagonal collapse is 6 static rolls.
- Overlapping input windows are two BlockSpecs over the same array (a
  body block and a halo block), so Pallas' automatic pipelining
  double-buffers the HBM reads — no manual DMA.

Traceable inside an enclosing jit (the fused wire program composes
convert → channelize → demod → pack as one XLA program).  Falls back to
the XLA path off-TPU and for geometries it doesn't cover
(`pallas_channelizer_supported`).  Cross-checked against
`_fir_polyphase_einsum` in tests/test_pallas_fir.py (interpret mode on
CPU; real-backend probe: tools/tpu_pallas_chan_probe.py).
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def carrier_period_samples(offset_hz: float, sample_rate: float,
                           max_period: int = 1 << 14) -> int | None:
    """Smallest q with offset/fs = p/q exactly (None if > max_period).

    The mixer e^{-j2pi (offset/fs) n} repeats every q samples iff the
    rate ratio is rational with denominator q.  AIS channels at ±25 kHz
    on the standard 2.4 Msps wideband rate give q = 96.
    """
    if offset_hz == 0:
        return 1
    fr = Fraction(offset_hz / sample_rate).limit_denominator(max_period)
    if fr == 0:
        return None
    err = abs(offset_hz / sample_rate - float(fr))
    return int(fr.denominator) if err < 1e-12 else None


def _geometry(ntaps: int, decim: int, offsets_hz, sample_rate: float):
    """(M, B_h, P_pad, rows_period) or None when unsupported."""
    p_rows = -(-ntaps // decim)
    if p_rows > 64:
        return None  # diagonal collapse assumes P <= 64 (6 rolls)
    periods = [carrier_period_samples(o, sample_rate) for o in offsets_hz]
    if any(p is None for p in periods):
        return None
    lcm = int(np.lcm.reduce([int(p) for p in periods] + [decim]))
    rows_period = lcm // decim
    if rows_period > 1024:
        return None
    # Output tile M: multiple of the carrier row-period AND 128 lanes.
    m = int(np.lcm(rows_period, 128))
    while m < 512:
        m *= 2
    if m > 4096:
        return None
    # Halo block: a divisor of M, multiple of 8, >= P-1, so the body
    # and halo BlockSpecs tile the overlapping windows exactly.
    b_h = None
    for cand in range(8, m + 1, 8):
        if m % cand == 0 and cand >= p_rows - 1:
            b_h = cand
            break
    if b_h is None:
        return None
    p_pad = 8 * -(-p_rows // 8)
    return m, b_h, p_pad, rows_period


def pallas_channelizer_supported(ntaps: int, decim: int, offsets_hz,
                                 sample_rate: float) -> bool:
    return _geometry(int(ntaps), int(decim), tuple(offsets_hz),
                     float(sample_rate)) is not None


def carrier_pattern(offsets_hz, sample_rate: float, decim: int,
                    ntaps: int) -> np.ndarray:
    """Periodic phase-major mixer tile, (n_chan, 2, D, M + B_h) float32.

    Entry [c, plane, r, j] is e^{-j2pi f_c (j*D + r)/fs}; because M is a
    multiple of the carrier row-period, the same tile is correct at
    every output-tile offset.  float64 phase accumulation on host.
    """
    m, b_h, _, _ = _geometry(ntaps, decim, tuple(offsets_hz), sample_rate)
    span = m + b_h
    n = np.arange(span * decim, dtype=np.float64)
    out = np.empty((len(offsets_hz), 2, decim, span), np.float32)
    for c, off in enumerate(offsets_hz):
        ph = np.remainder(-2.0 * np.pi * (off / sample_rate) * n, 2 * np.pi)
        cplx = np.exp(1j * ph).reshape(span, decim).T  # (D, span)
        out[c, 0] = cplx.real.astype(np.float32)
        out[c, 1] = cplx.imag.astype(np.float32)
    return out


def tap_matrix(taps: np.ndarray, decim: int) -> np.ndarray:
    """(P_pad, D) float32, H[p, r] = taps[p*D + r] (zero-padded)."""
    t = np.asarray(taps, np.float32)
    p_pad = 8 * -(-(-(-t.size // decim)) // 8)
    h = np.zeros((p_pad, decim), np.float32)
    h.flat[: t.size] = t
    return h


def _chan_kernel(m: int, b_h: int, p_pad: int):
    span = m + b_h

    def kernel(xr_m, xi_m, xr_h, xi_h, car, h, outr, outi):
        xr = jnp.concatenate([xr_m[:], xr_h[:]], axis=1)  # (D, span)
        xi = jnp.concatenate([xi_m[:], xi_h[:]], axis=1)
        cr = car[0, 0]
        ci = car[0, 1]
        mr = xr * cr - xi * ci
        mi = xr * ci + xi * cr
        zr = jnp.dot(h[:], mr, preferred_element_type=jnp.float32)
        zi = jnp.dot(h[:], mi, preferred_element_type=jnp.float32)
        # Anti-diagonal collapse y[j] = sum_p Z[p, j+p]: rotate row p
        # left by p via log2(P) static whole-array rolls gated on the
        # bits of the sublane index, then one sublane-axis reduction.
        # No wrap corruption: nonzero tap rows have p <= P-1 <= b_h so
        # j+p <= m-1+b_h = span-1; rows p >= P are all-zero (padded H)
        # and wrap harmlessly.
        row = jax.lax.broadcasted_iota(jnp.int32, (p_pad, span), 0)
        shift = 1
        while shift < p_pad:
            zr_s = jnp.concatenate([zr[:, shift:], zr[:, :shift]], axis=1)
            zi_s = jnp.concatenate([zi[:, shift:], zi[:, :shift]], axis=1)
            sel = (row & shift) != 0
            zr = jnp.where(sel, zr_s, zr)
            zi = jnp.where(sel, zi_s, zi)
            shift *= 2
        outr[0, :] = jnp.sum(zr, axis=0, keepdims=True)[0, :m]
        outi[0, :] = jnp.sum(zi, axis=0, keepdims=True)[0, :m]

    return kernel


class PallasChannelizer:
    """Fused mixer+polyphase channelizer on the Pallas path.

    `__call__(x, phase0s)` -> (n_chan, n_out) complex64, traceable
    inside an enclosing jit; `x` is (n_in,) complex64 (or (n_in, 2)
    float planes), `phase0s` the per-channel runtime mixer start phase.
    The periodic carrier pattern and the tap matrix are device buffers
    created once at construction.
    """

    def __init__(self, taps: np.ndarray, decim: int, offsets_hz,
                 sample_rate: float, n_in: int, interpret: bool = False):
        t = np.asarray(taps, np.float32)
        geo = _geometry(t.size, int(decim), tuple(offsets_hz),
                        float(sample_rate))
        if geo is None:
            raise ValueError("geometry unsupported; use the XLA path")
        if n_in % decim:
            raise ValueError(f"n_in {n_in} not a multiple of decim {decim}")
        self.m, self.b_h, self.p_pad, self.rows_period = geo
        self.ntaps = int(t.size)
        self.decim = int(decim)
        self.offsets = tuple(float(o) for o in offsets_hz)
        self.rate = float(sample_rate)
        self.n_in = int(n_in)
        self.interpret = bool(interpret)
        self.car_pat = jax.device_put(
            carrier_pattern(self.offsets, self.rate, self.decim, self.ntaps)
        )
        self.h_mat = jax.device_put(tap_matrix(t, self.decim))

    @property
    def n_out(self) -> int:
        return self.n_in // self.decim - (-(-self.ntaps // self.decim)) + 1

    def __call__(self, x: jax.Array, phase0s: jax.Array) -> jax.Array:
        from ais_tpu.ops.cplx import as_complex_input

        x = as_complex_input(x)
        m, b_h, p_pad, decim = self.m, self.b_h, self.p_pad, self.decim
        span = m + b_h
        n_rows = self.n_in // decim
        n_out = self.n_out
        n_chan = len(self.offsets)
        n_tiles = -(-n_out // m)
        pad_rows = n_tiles * m + b_h

        # Phase-major transpose on float planes (ARCHITECTURE.md §4).
        def prep(plane):
            v = jnp.moveaxis(plane.reshape(n_rows, decim), -1, -2)
            return jnp.concatenate(
                [v, jnp.zeros((decim, pad_rows - n_rows), jnp.float32)],
                axis=-1,
            )

        xr, xi = prep(jnp.real(x)), prep(jnp.imag(x))

        # Rotate the periodic carrier tile by the runtime start phase.
        rot_r = jnp.cos(phase0s)[:, None, None]
        rot_i = jnp.sin(phase0s)[:, None, None]
        cr, ci = self.car_pat[:, 0], self.car_pat[:, 1]
        car = jnp.stack(
            [cr * rot_r - ci * rot_i, cr * rot_i + ci * rot_r], axis=1
        )  # (n_chan, 2, D, span)

        tiles_per_m = m // b_h
        kernel = _chan_kernel(m, b_h, p_pad)
        outr, outi = pl.pallas_call(
            kernel,
            grid=(n_chan, n_tiles),
            in_specs=[
                pl.BlockSpec((decim, m), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((decim, m), lambda c, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (decim, b_h),
                    lambda c, i, t=tiles_per_m: (0, i * t + t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (decim, b_h),
                    lambda c, i, t=tiles_per_m: (0, i * t + t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 2, decim, span), lambda c, i: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p_pad, decim), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, m), lambda c, i: (c, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda c, i: (c, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
                jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * p_pad * decim * span * n_chan * n_tiles,
                bytes_accessed=2 * (pad_rows * decim * 4) * n_chan
                + 2 * n_chan * n_tiles * m * 4,
                transcendentals=0,
            ),
            interpret=self.interpret,
        )(xr, xi, xr, xi, car, self.h_mat)
        return jax.lax.complex(outr[:, :n_out], outi[:, :n_out])
