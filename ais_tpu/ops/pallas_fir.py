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
    # Halo block: divides M and is a multiple of 128 (Mosaic requires
    # block dims divisible by (8, 128) unless they span the full array);
    # P <= 64 so 128 always covers the needed P-1 overlap rows.
    b_h = 128
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


def _collapse(z, p_pad, span):
    """Anti-diagonal collapse y[j] = sum_p Z[p, j+p]: rotate row p left
    by p via log2(P) static whole-array rolls gated on the bits of the
    sublane index, then one sublane-axis reduction.  No wrap corruption:
    nonzero tap rows have p <= P-1 <= b_h so j+p <= m-1+b_h = span-1
    for the kept j < m; rows p >= P are all-zero (padded H) and wrap
    harmlessly."""
    row = jax.lax.broadcasted_iota(jnp.int32, (p_pad, span), 0)
    shift = 1
    while shift < p_pad:
        z_s = jnp.concatenate([z[:, shift:], z[:, :shift]], axis=1)
        z = jnp.where((row & shift) != 0, z_s, z)
        shift *= 2
    return jnp.sum(z, axis=0, keepdims=True)  # (1, span)


def _chan_kernel(m: int, b_h: int, p_pad: int, n_chan: int):
    span = m + b_h

    def kernel(xr_m, xi_m, xr_h, xi_h, car, h, outr, outi):
        xr = jnp.concatenate([xr_m[:], xr_h[:]], axis=1)  # (D, span)
        xi = jnp.concatenate([xi_m[:], xi_h[:]], axis=1)
        # Static channel loop: one tile's input feeds every channel, and
        # the (n_chan, m) output block spans the full channel dim (the
        # Mosaic block-shape rule disallows per-channel (1, m) blocks).
        for c in range(n_chan):
            cr = car[c, 0]
            ci = car[c, 1]
            mr = xr * cr - xi * ci
            mi = xr * ci + xi * cr
            # HIGHEST: the MXU's default bf16-input pass loses ~8
            # mantissa bits (~4e-3 rel err) — audible as correlation
            # floor noise; full-f32 passes keep the filter exact.
            zr = jnp.dot(h[:], mr, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            zi = jnp.dot(h[:], mi, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            outr[c, :] = _collapse(zr, p_pad, span)[0, :m]
            outi[c, :] = _collapse(zi, p_pad, span)[0, :m]

    return kernel


def pallas_freq_xlating_polyphase(
    x: jax.Array,
    phase0s: jax.Array,
    car_pat: jax.Array,
    h_mat: jax.Array,
    *,
    ntaps: int,
    decim: int,
    offsets,
    rate: float,
    n_in: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused mixer + polyphase channelizer, Pallas path.

    Traceable inside an enclosing jit.  `x`: (n_in,) complex64 or
    (n_in, 2) float planes; `phase0s`: (n_chan,) runtime mixer start
    phases; `car_pat`/`h_mat`: device buffers from `carrier_pattern` /
    `tap_matrix`.  Returns (n_chan, n_out) complex64 — same contract as
    `ops/fir.py:freq_xlating_polyphase`.

    `interpret=None` auto-selects interpreter mode off-TPU so the same
    pipeline code runs under the CPU test backend.
    """
    from ais_tpu.ops.cplx import as_complex_input

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    geo = _geometry(int(ntaps), int(decim), tuple(offsets), float(rate))
    if geo is None:
        raise ValueError("geometry unsupported; use the XLA path")
    m, b_h, p_pad, _ = geo
    x = as_complex_input(x)
    span = m + b_h
    n_rows = n_in // decim
    n_out = n_rows - (-(-ntaps // decim)) + 1
    n_chan = len(offsets)
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
    cr, ci = car_pat[:, 0], car_pat[:, 1]
    car = jnp.stack(
        [cr * rot_r - ci * rot_i, cr * rot_i + ci * rot_r], axis=1
    )  # (n_chan, 2, D, span)

    tiles_per_m = m // b_h
    kernel = _chan_kernel(m, b_h, p_pad, n_chan)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((decim, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((decim, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (decim, b_h),
                lambda i, t=tiles_per_m: (0, i * t + t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (decim, b_h),
                lambda i, t=tiles_per_m: (0, i * t + t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_chan, 2, decim, span), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, decim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_chan, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
            jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * decim * span * n_chan * n_tiles,
            bytes_accessed=2 * (pad_rows * decim * 4)
            + 2 * n_chan * n_tiles * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, xr, xi, car, h_mat)
    return jax.lax.complex(outr[:, :n_out], outi[:, :n_out])


class PallasChannelizer:
    """Convenience wrapper owning the carrier/tap device buffers.

    `__call__(x, phase0s)` -> (n_chan, n_out) complex64, traceable
    inside an enclosing jit (`pallas_freq_xlating_polyphase`).
    """

    def __init__(self, taps: np.ndarray, decim: int, offsets_hz,
                 sample_rate: float, n_in: int,
                 interpret: bool | None = None):
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
        self.interpret = interpret
        self.car_pat = jax.device_put(
            carrier_pattern(self.offsets, self.rate, self.decim, self.ntaps)
        )
        self.h_mat = jax.device_put(tap_matrix(t, self.decim))

    @property
    def n_out(self) -> int:
        return self.n_in // self.decim - (-(-self.ntaps // self.decim)) + 1

    def __call__(self, x: jax.Array, phase0s: jax.Array) -> jax.Array:
        return pallas_freq_xlating_polyphase(
            x, phase0s, self.car_pat, self.h_mat,
            ntaps=self.ntaps, decim=self.decim, offsets=self.offsets,
            rate=self.rate, n_in=self.n_in, interpret=self.interpret,
        )


# ---------------------------------------------------------------------------
# Fused wire-ingest channelizer: packed integer IQ bytes -> channels.
#
# The exec-split probe (tools/tpu_exec_profile.py) showed the XLA
# integer-IQ unpack (`ops/convert.py`) costing MORE than the channelizer
# itself (28 ms vs 26 ms per 9.64 Ms step): the even/odd lane
# interleaves lower to pathological relayouts on this backend, and the
# full-rate float planes make an HBM round trip between the two stages.
# This kernel decodes the wire bytes, mixes, filters and decimates in
# ONE VMEM-resident pass per tile.
#
# The interleave problem is solved STATICALLY: the decode step yields
# sample lanes in a permuted order (e.g. ci2 gives [0,2,..,48,1,3,..,49]
# within each 50-sample row), and instead of shuffling data lanes we
# permute the TAP MATRIX rows and CARRIER lanes to match — host-side,
# once.  The MXU contracts over lanes in any order.
# ---------------------------------------------------------------------------

_WIRE_PERMS = {
    # fmt -> (bytes per decim-row maker, lane permutation maker)
    "ci2": (lambda d: d // 2, lambda d: np.r_[np.arange(0, d, 2), np.arange(1, d, 2)]),
    "ci4": (lambda d: d, lambda d: np.arange(d)),
}

# ci1 packs 4 complex samples per byte, so one decim-row of D=50 spans a
# fractional 12.5 bytes: the kernel instead works in UNITS of 2
# decim-rows (25 bytes, 100 samples).  The decode concat (4 bit-pair
# extracts along lanes) leaves lane p = 25*k + l holding unit-sample
# s = 4*l + k; as with ci2, the data lanes stay put and the carrier
# lanes + tap matrix are permuted host-side to match.
_CI1_UNIT_ROWS = 2


def _ci1_unit_perm(decim: int) -> np.ndarray:
    n = decim * _CI1_UNIT_ROWS
    return np.concatenate([np.arange(k, n, 4) for k in range(4)])


# cr1 packs 8 REAL samples per byte (1 bit per complex sample at an fs/4
# IF, ops/convert.py:iq_from_bytes_cr1): one D=50 decim-row spans 6.25
# bytes, so the kernel works in UNITS of R = 8/gcd(8, D) decim-rows
# (D=50 -> 4 rows, 25 bytes, 200 samples).  The decode is trivial
# (bit -> ±1) and the (-j)^n IF downconversion FOLDS INTO THE CARRIER
# TILE: decoded·mixer = r[n]·e^{-j2π(off+fs/4)n/fs}, whose row period
# at the standard geometry equals the baseband one (625e3·50/2.4e6 and
# 25e3·50/2.4e6 share the 1/48 fractional part).  The input being real
# also halves the mix work: mr = x·cr, mi = x·ci — no cross terms.


def _cr1_unit_rows(decim: int) -> int:
    return 8 // int(np.gcd(8, decim))


def _cr1_unit_perm(decim: int) -> np.ndarray:
    n = decim * _cr1_unit_rows(decim)
    return np.concatenate([np.arange(k, n, 8) for k in range(8)])


def _cr1_m(m: int, r: int) -> int | None:
    """Output tile for the cr1 kernel: the per-parity out block minor dim
    m/R must be a Mosaic-legal 128 multiple; grow m (stays a multiple of
    the carrier row-period) until it is."""
    while (m // r) % 128 and m <= 4096:
        m *= 2
    return m if m <= 4096 else None


def wire_channelizer_supported(fmt: str, ntaps: int, decim: int,
                               offsets_hz, sample_rate: float,
                               n_in: int | None = None) -> bool:
    """True when the fused wire kernel handles this (fmt, geometry).

    Pass `n_in` when known: the ci1 2-row-unit kernel additionally needs
    `n_in % (2*decim) == 0`, which the receiver's lcm(decim, 4)
    alignment guarantees only for decim % 4 == 2 (e.g. the production
    50).  decim % 4 == 0 would fit a 1-row-unit variant (bpr = decim/4
    is integral) that is not implemented — those geometries fall back
    to the XLA convert + Pallas float channelizer.
    """
    if fmt == "ci1":
        if decim % 4 != 2:
            return False
        if n_in is not None and n_in % (_CI1_UNIT_ROWS * decim):
            return False
        return pallas_channelizer_supported(ntaps, decim, offsets_hz,
                                            sample_rate)
    if fmt == "cr1":
        r = _cr1_unit_rows(decim)
        if n_in is not None and n_in % (r * decim):
            return False
        # The IF-shifted carriers must stay periodic and the grown output
        # tile legal.
        eff = tuple(o + sample_rate / 4.0 for o in offsets_hz)
        geo = _geometry(ntaps, decim, eff, sample_rate)
        if geo is None:
            return False
        return _cr1_m(geo[0], r) is not None
    if fmt not in _WIRE_PERMS:
        return False
    if fmt == "ci2" and decim % 2:
        return False
    return pallas_channelizer_supported(ntaps, decim, offsets_hz, sample_rate)


def wire_channelizer_buffers(fmt: str, taps: np.ndarray, decim: int,
                             offsets_hz, sample_rate: float,
                             m_mult: int = 1):
    """(carrier tile, tap matrix) with lanes permuted for `fmt`'s decode
    order.  Carrier is row-major here: (n_chan, 2, span, D_perm) — for
    ci1, (n_chan, 2, span/2, 2*D_perm) over 2-row units, and the tap
    matrix becomes the two anti-diagonal HALVES (2, lanes, P2_pad): see
    `_wire_kernel_ci1`.

    `m_mult` (cr1 only) multiplies the output tile m — fewer, fatter
    grid tiles amortizing Mosaic's per-tile overhead.  An integer
    multiple keeps every invariant: carrier periodicity over the tile
    advance (m*decim stays a whole number of carrier cycles), mR % 128
    (Mosaic minor-dim rule) and mR % bhR (halo index map).  The carrier
    tile grows to (n_chan, 2, (m_mult*m + b_h)/R, lanes) — VMEM-bound,
    ~1.3 MB per unit of m_mult at the production geometry."""
    t = np.asarray(taps, np.float32)
    if m_mult != 1 and fmt != "cr1":
        raise ValueError("m_mult > 1 is only implemented for cr1")
    if fmt == "cr1":
        # IF-shifted carriers (off + fs/4 — the (-j)^n downconversion
        # folded in), unit geometry R rows/unit, anti-diagonal R-way
        # folded tap matrix (same construction as ci1's halves, R=4 at
        # the production decim 50).
        R = _cr1_unit_rows(decim)
        eff = tuple(o + float(sample_rate) / 4.0 for o in offsets_hz)
        m, b_h, _, _ = _geometry(t.size, decim, eff, float(sample_rate))
        m = _cr1_m(m, R) * int(m_mult)
        span = m + b_h
        lanes = decim * R
        perm = _cr1_unit_perm(decim)
        span_u = span // R
        n = np.arange(span_u * lanes, dtype=np.float64)
        car = np.empty((len(offsets_hz), 2, span_u, lanes), np.float32)
        for c, off in enumerate(eff):
            ph = np.remainder(-2.0 * np.pi * (off / sample_rate) * n,
                              2 * np.pi)
            cplx = np.exp(1j * ph).reshape(span_u, lanes)[:, perm]
            car[c, 0] = cplx.real.astype(np.float32)
            car[c, 1] = cplx.imag.astype(np.float32)
        p_rows = -(-t.size // decim)
        h_full = np.zeros((p_rows, decim), np.float32)
        h_full.flat[: t.size] = t
        pR = (p_rows + R - 2) // R + 1
        pR_pad = 8 * -(-pR // 8)
        inv = np.empty(lanes, np.int64)
        inv[perm] = np.arange(lanes)
        g = np.zeros((R, lanes, pR_pad), np.float32)
        for e in range(R):
            for p in range(p_rows):
                u, hh = divmod(e + p, R)
                g[e, inv[hh * decim : (hh + 1) * decim], u] = h_full[p]
        return car, g
    m, b_h, p_pad, _ = _geometry(t.size, decim, tuple(offsets_hz),
                                 float(sample_rate))
    span = m + b_h
    if fmt == "ci1":
        R = _CI1_UNIT_ROWS
        lanes = decim * R
        perm = _ci1_unit_perm(decim)  # lane q holds unit sample perm[q]
        span_u = span // R
        n = np.arange(span_u * lanes, dtype=np.float64)
        car = np.empty((len(offsets_hz), 2, span_u, lanes), np.float32)
        for c, off in enumerate(offsets_hz):
            ph = np.remainder(-2.0 * np.pi * (off / sample_rate) * n,
                              2 * np.pi)
            cplx = np.exp(1j * ph).reshape(span_u, lanes)[:, perm]
            car[c, 0] = cplx.real.astype(np.float32)
            car[c, 1] = cplx.imag.astype(np.float32)
        # Tap halves: y[2*j2+e] = sum_u sum_q G[e, q, u] * X2[j2+u, q]
        # with G[e, lane_of(h*D+d), (e+p)//2] = H[p, d], h = (e+p)%2 —
        # the unique (p, d) per (e, u, q) makes this an assignment.
        p_rows = -(-t.size // decim)
        h_full = np.zeros((p_rows, decim), np.float32)
        h_full.flat[: t.size] = t
        p2 = p_rows // 2 + 1
        p2_pad = 8 * -(-p2 // 8)
        inv = np.empty(lanes, np.int64)
        inv[perm] = np.arange(lanes)
        g = np.zeros((R, lanes, p2_pad), np.float32)
        for e in range(R):
            for p in range(p_rows):
                u, hh = divmod(e + p, R)
                g[e, inv[hh * decim : (hh + 1) * decim], u] = h_full[p]
        return car, g
    perm = _WIRE_PERMS[fmt][1](decim)
    n = np.arange(span * decim, dtype=np.float64)
    car = np.empty((len(offsets_hz), 2, span, decim), np.float32)
    for c, off in enumerate(offsets_hz):
        ph = np.remainder(-2.0 * np.pi * (off / sample_rate) * n, 2 * np.pi)
        cplx = np.exp(1j * ph).reshape(span, decim)[:, perm]
        car[c, 0] = cplx.real.astype(np.float32)
        car[c, 1] = cplx.imag.astype(np.float32)
    h = np.zeros((p_pad, decim), np.float32)
    h.flat[: t.size] = t
    h_perm = np.ascontiguousarray(h[:, perm].T)  # (D_perm, p_pad)
    return car, h_perm


def _decode_ci2(b32):
    """(span, D/2) int32 bytes -> re, im (span, D) in [evens, odds] lane
    order; Lloyd-Max levels (must match ops/convert.py:iq_from_bytes_ci2)."""
    from ais_tpu.ops.convert import CI2_INNER, CI2_OUTER

    def dec(c):
        m = c.astype(jnp.float32) - 1.5
        mag = jnp.where(jnp.abs(m) > 1.0, CI2_OUTER, CI2_INNER)
        return jnp.sign(m) * mag

    re = jnp.concatenate([dec(b32 >> 6), dec((b32 >> 2) & 3)], axis=1)
    im = jnp.concatenate([dec((b32 >> 4) & 3), dec(b32 & 3)], axis=1)
    return re, im


def _decode_ci4(b32, scale=1.0 / 8.0):
    """(span, D) int32 bytes -> re, im (span, D), identity lane order
    (must match ops/convert.py:iq_from_bytes_ci4)."""
    i = b32 >> 4
    q = b32 & 15
    i = i - 16 * (i >= 8)
    q = q - 16 * (q >= 8)
    return i.astype(jnp.float32) * scale, q.astype(jnp.float32) * scale


def _wire_kernel(fmt: str, m: int, b_h: int, p_pad: int, decim: int,
                 n_chan: int):
    span = m + b_h
    decode = {"ci2": _decode_ci2, "ci4": _decode_ci4}[fmt]

    def kernel(b_m, b_h_ref, car, h, outr, outi):
        b = jnp.concatenate([b_m[:], b_h_ref[:]], axis=0).astype(jnp.int32)
        xr, xi = decode(b)                       # (span, D) permuted lanes
        for c in range(n_chan):
            cr = car[c, 0]
            ci = car[c, 1]
            mr = xr * cr - xi * ci
            mi = xr * ci + xi * cr
            zr = jnp.dot(mr, h[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            zi = jnp.dot(mi, h[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            # Transpose to (P_pad, span) so the anti-diagonal collapse
            # and the lane-major store reuse the validated v1 shape.
            outr[c, :] = _collapse(zr.T, p_pad, span)[0, :m]
            outi[c, :] = _collapse(zi.T, p_pad, span)[0, :m]

    return kernel


def _wire_kernel_ci1(m2: int, bh2: int, p2_pad: int, decim: int,
                     n_chan: int):
    """ci1 kernel over 2-decim-row units: decode 4 bit-pair extracts
    (lane order matched by the permuted carrier/taps), mix, then run the
    polyphase matmul as TWO anti-diagonal halves — output row j = 2*j2+e
    reads unit rows j2+(e+p)//2, so each parity e gets its own folded
    tap matrix g[e] (built in wire_channelizer_buffers)."""
    span2 = m2 + bh2

    def kernel(b_m, b_h_ref, car, g, outr, outi):
        b = jnp.concatenate([b_m[:], b_h_ref[:]], axis=0).astype(jnp.int32)
        lvl = lambda x: x.astype(jnp.float32) * 2.0 - 1.0  # noqa: E731
        xr = jnp.concatenate([lvl((b >> s) & 1) for s in (7, 5, 3, 1)],
                             axis=1)  # (span2, 2*decim) permuted lanes
        xi = jnp.concatenate([lvl((b >> s) & 1) for s in (6, 4, 2, 0)],
                             axis=1)
        for c in range(n_chan):
            cr = car[c, 0]
            ci = car[c, 1]
            mr = xr * cr - xi * ci
            mi = xr * ci + xi * cr
            for e in range(_CI1_UNIT_ROWS):
                zr = jnp.dot(mr, g[e], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                zi = jnp.dot(mi, g[e], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                outr[c, e, :] = _collapse(zr.T, p2_pad, span2)[0, :m2]
                outi[c, e, :] = _collapse(zi.T, p2_pad, span2)[0, :m2]

    return kernel


def _wire_kernel_cr1(mR: int, bhR: int, pR_pad: int, R: int, n_chan: int):
    """cr1 kernel over R-decim-row units: decode 8 bit extracts to ±1
    REAL samples (lane order matched by the permuted IF carrier/taps),
    mix against the IF-folded complex carrier (real input: no cross
    terms), then the polyphase matmul as R anti-diagonal folds — output
    row j = R*j2+e reads unit rows j2+(e+p)//R with parity-e tap matrix
    g[e] (wire_channelizer_buffers)."""
    spanR = mR + bhR

    def kernel(b_m, b_h_ref, car, g, outr, outi):
        b = jnp.concatenate([b_m[:], b_h_ref[:]], axis=0).astype(jnp.int32)
        lvl = lambda x: x.astype(jnp.float32) * 2.0 - 1.0  # noqa: E731
        x = jnp.concatenate(
            [lvl((b >> s) & 1) for s in (7, 6, 5, 4, 3, 2, 1, 0)], axis=1
        )  # (spanR, R*decim) real ±1, permuted lanes
        for c in range(n_chan):
            mr = x * car[c, 0]
            mi = x * car[c, 1]
            for e in range(R):
                zr = jnp.dot(mr, g[e], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                zi = jnp.dot(mi, g[e], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                outr[c, e, :] = _collapse(zr.T, pR_pad, spanR)[0, :mR]
                outi[c, e, :] = _collapse(zi.T, pR_pad, spanR)[0, :mR]

    return kernel


def _pallas_wire_channelizer_cr1(
    raw_u8, phase0s, car_pat, g_mat, *, ntaps, decim, offsets, rate,
    n_in, interpret, m_mult=1,
):
    if not wire_channelizer_supported("cr1", ntaps, decim, offsets, rate,
                                      n_in):
        raise ValueError("geometry/format unsupported; use the XLA path")
    R = _cr1_unit_rows(decim)
    eff = tuple(o + float(rate) / 4.0 for o in offsets)
    m, b_h, _, _ = _geometry(int(ntaps), int(decim), eff, float(rate))
    m = _cr1_m(m, R) * int(m_mult)
    lanes = decim * R
    bpr_u = lanes // 8  # wire bytes per unit
    mR, bhR = m // R, b_h // R
    spanR = mR + bhR
    pR_pad = g_mat.shape[-1]
    n_rows = n_in // decim
    n_out = n_rows - (-(-ntaps // decim)) + 1
    n_chan = len(offsets)
    n_tiles = -(-n_out // m)
    n_units = n_in // lanes
    pad_units = n_tiles * mR + bhR

    b2d = raw_u8.reshape(n_units, bpr_u)
    b2d = jnp.concatenate(
        [b2d, jnp.zeros((pad_units - n_units, bpr_u), jnp.uint8)], axis=0
    )

    rot_r = jnp.cos(phase0s)[:, None, None]
    rot_i = jnp.sin(phase0s)[:, None, None]
    cr, ci = car_pat[:, 0], car_pat[:, 1]
    car = jnp.stack(
        [cr * rot_r - ci * rot_i, cr * rot_i + ci * rot_r], axis=1
    )  # (n_chan, 2, spanR, lanes)

    tiles_per_m = mR // bhR
    kernel = _wire_kernel_cr1(mR, bhR, pR_pad, R, n_chan)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((mR, bpr_u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bhR, bpr_u),
                lambda i, t=tiles_per_m: (i * t + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_chan, 2, spanR, lanes), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, lanes, pR_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_chan, R, mR), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, R, mR), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chan, R, n_tiles * mR), jnp.float32),
            jax.ShapeDtypeStruct((n_chan, R, n_tiles * mR), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * pR_pad * lanes * spanR * R * n_chan * n_tiles,
            bytes_accessed=pad_units * bpr_u
            + 2 * n_chan * R * n_tiles * mR * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(b2d, b2d, car, g_mat)
    # Interleave the parity folds: y[c, R*j2+e] = out[c, e, j2].
    yr = jnp.moveaxis(outr, 1, 2).reshape(n_chan, R * n_tiles * mR)
    yi = jnp.moveaxis(outi, 1, 2).reshape(n_chan, R * n_tiles * mR)
    return jax.lax.complex(yr[:, :n_out], yi[:, :n_out])


def _pallas_wire_channelizer_ci1(
    raw_u8, phase0s, car_pat, g_mat, *, ntaps, decim, offsets, rate,
    n_in, interpret,
):
    geo = _geometry(int(ntaps), int(decim), tuple(offsets), float(rate))
    if geo is None or not wire_channelizer_supported(
        "ci1", ntaps, decim, offsets, rate, n_in
    ):
        raise ValueError("geometry/format unsupported; use the XLA path")
    m, b_h, _, _ = geo
    R = _CI1_UNIT_ROWS
    lanes = decim * R
    bpr_u = lanes // 4  # wire bytes per unit
    m2, bh2 = m // R, b_h // R
    span2 = m2 + bh2
    p2_pad = g_mat.shape[-1]
    n_rows = n_in // decim
    n_out = n_rows - (-(-ntaps // decim)) + 1
    n_chan = len(offsets)
    n_tiles = -(-n_out // m)
    n_units = n_in // lanes
    pad_units = n_tiles * m2 + bh2

    b2d = raw_u8.reshape(n_units, bpr_u)
    b2d = jnp.concatenate(
        [b2d, jnp.zeros((pad_units - n_units, bpr_u), jnp.uint8)], axis=0
    )

    rot_r = jnp.cos(phase0s)[:, None, None]
    rot_i = jnp.sin(phase0s)[:, None, None]
    cr, ci = car_pat[:, 0], car_pat[:, 1]
    car = jnp.stack(
        [cr * rot_r - ci * rot_i, cr * rot_i + ci * rot_r], axis=1
    )  # (n_chan, 2, span2, lanes)

    tiles_per_m = m2 // bh2
    kernel = _wire_kernel_ci1(m2, bh2, p2_pad, decim, n_chan)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m2, bpr_u), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bh2, bpr_u),
                lambda i, t=tiles_per_m: (i * t + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_chan, 2, span2, lanes), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, lanes, p2_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_chan, R, m2), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, R, m2), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chan, R, n_tiles * m2), jnp.float32),
            jax.ShapeDtypeStruct((n_chan, R, n_tiles * m2), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * p2_pad * lanes * span2 * R * n_chan * n_tiles,
            bytes_accessed=pad_units * bpr_u
            + 2 * n_chan * R * n_tiles * m2 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(b2d, b2d, car, g_mat)
    # Interleave the parity halves: y[c, 2*j2+e] = out[c, e, j2].
    yr = jnp.moveaxis(outr, 1, 2).reshape(n_chan, R * n_tiles * m2)
    yi = jnp.moveaxis(outi, 1, 2).reshape(n_chan, R * n_tiles * m2)
    return jax.lax.complex(yr[:, :n_out], yi[:, :n_out])


def pallas_wire_channelizer(
    raw_u8: jax.Array,
    phase0s: jax.Array,
    car_pat: jax.Array,
    h_mat: jax.Array,
    *,
    fmt: str,
    ntaps: int,
    decim: int,
    offsets,
    rate: float,
    n_in: int,
    interpret: bool | None = None,
    m_mult: int = 1,
) -> jax.Array:
    """Packed integer IQ wire bytes -> (n_chan, n_out) channels, fused.

    `raw_u8`: the wire buffer for n_in complex samples (ci2: n_in/2
    bytes, ci4: n_in bytes); `car_pat`/`h_mat` from
    `wire_channelizer_buffers(fmt, ...)`.  Replaces
    `iq_from_bytes_*` + `freq_xlating_polyphase` in the wire program.
    `m_mult` must match the value the buffers were built with (cr1
    only; see `wire_channelizer_buffers`).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if m_mult != 1 and fmt != "cr1":
        raise ValueError("m_mult > 1 is only implemented for cr1")
    if fmt == "ci1":
        return _pallas_wire_channelizer_ci1(
            raw_u8, phase0s, car_pat, h_mat, ntaps=ntaps, decim=decim,
            offsets=offsets, rate=rate, n_in=n_in, interpret=interpret,
        )
    if fmt == "cr1":
        return _pallas_wire_channelizer_cr1(
            raw_u8, phase0s, car_pat, h_mat, ntaps=ntaps, decim=decim,
            offsets=offsets, rate=rate, n_in=n_in, interpret=interpret,
            m_mult=m_mult,
        )
    geo = _geometry(int(ntaps), int(decim), tuple(offsets), float(rate))
    if geo is None or fmt not in _WIRE_PERMS:
        raise ValueError("geometry/format unsupported; use the XLA path")
    m, b_h, p_pad, _ = geo
    span = m + b_h
    bpr = _WIRE_PERMS[fmt][0](decim)  # wire bytes per decim-row
    n_rows = n_in // decim
    n_out = n_rows - (-(-ntaps // decim)) + 1
    n_chan = len(offsets)
    n_tiles = -(-n_out // m)
    pad_rows = n_tiles * m + b_h

    b2d = raw_u8.reshape(n_rows, bpr)
    b2d = jnp.concatenate(
        [b2d, jnp.zeros((pad_rows - n_rows, bpr), jnp.uint8)], axis=0
    )

    rot_r = jnp.cos(phase0s)[:, None, None]
    rot_i = jnp.sin(phase0s)[:, None, None]
    cr, ci = car_pat[:, 0], car_pat[:, 1]
    car = jnp.stack(
        [cr * rot_r - ci * rot_i, cr * rot_i + ci * rot_r], axis=1
    )  # (n_chan, 2, span, D)

    tiles_per_m = m // b_h
    kernel = _wire_kernel(fmt, m, b_h, p_pad, decim, n_chan)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m, bpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (b_h, bpr),
                lambda i, t=tiles_per_m: (i * t + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_chan, 2, span, decim), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((decim, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_chan, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
            jax.ShapeDtypeStruct((n_chan, n_tiles * m), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * decim * span * n_chan * n_tiles,
            bytes_accessed=pad_rows * bpr
            + 2 * n_chan * n_tiles * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(b2d, b2d, car, h_mat)
    return jax.lax.complex(outr[:, :n_out], outi[:, :n_out])
