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

from ais_tpu.ops.firdes import low_pass_2


@functools.lru_cache(maxsize=16)
def default_prototype(
    nfilts: int = 32,
    cutoff_frac: float = 0.4,
    attenuation_db: float = 96.0,
) -> np.ndarray:
    """Prototype low-pass for near-unity resampling rates.

    Cutoff at `cutoff_frac` of the input Nyquist (in the nfilts-
    upsampled domain), unity DC gain per phase (gain = nfilts overall),
    designed to the reference development flowgraph's 96 dB stopband
    spec (python/ais.grc:1523 — firdes.low_pass_2(..., 96)).
    """
    return low_pass_2(
        float(nfilts),
        float(nfilts),
        cutoff_frac,
        0.1,
        attenuation_db,
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


class PfbArbResampler:
    """Streaming polyphase arbitrary resampler with exact state carry.

    The stateless `pfb_arb_resample` restarts the fractional output grid
    and loses the final `taps_per_phase` input samples at every call —
    fatal for the reference's *default* operating mode, continuous
    250 ksps streaming (reference: python/radio.py:120-121), where a
    packet straddling a chunk boundary must still decode.  This class is
    the GNU Radio-equivalent streaming form: it keeps the undigested
    input tail and the absolute output counter, so concatenated
    `process()` calls produce exactly the same sample sequence as one
    call over the whole stream, for any chunking.

    Host-side numpy on purpose: this is the fractional-rate ingest path
    (~50 ksps), where per-chunk jit recompiles for varying lengths would
    dwarf the microseconds of FIR math.
    """

    def __init__(self, rate: float, taps: np.ndarray | None = None, nfilts: int = 32):
        if taps is None:
            taps = default_prototype(nfilts)
        self.rate = float(rate)
        self.nfilts = int(nfilts)
        self._bank = polyphase_bank(taps, nfilts)
        self.taps_per_phase = self._bank.shape[1]
        self._buf = np.zeros(0, dtype=np.complex64)
        self._buf_start = 0   # absolute input index of _buf[0]
        self._k = 0           # outputs emitted so far (absolute output index)

    @property
    def outputs_emitted(self) -> int:
        return self._k

    def process(self, x: np.ndarray) -> np.ndarray:
        """Consume a chunk; return every output now computable.

        Output k (absolute) reads the input frame starting at
        floor(k / rate); the fractional part selects/interpolates the
        phase banks, identically to `pfb_arb_resample`.
        """
        x = np.asarray(x, dtype=np.complex64)
        if x.size:
            self._buf = np.concatenate([self._buf, x])
        tpp = self.taps_per_phase
        limit = self._buf_start + self._buf.size - tpp  # max usable base
        if limit < 0:
            return np.zeros(0, dtype=np.complex64)
        # floor(k / rate) <= limit  =>  k < (limit + 1) * rate
        k_end = int(np.ceil((limit + 1) * self.rate - 1e-9))
        ks = np.arange(self._k, k_end, dtype=np.int64)
        pos = ks / self.rate
        base = np.floor(pos).astype(np.int64)
        # Trim any float-edge stragglers whose frame is not complete yet.
        good = base <= limit
        ks, pos, base = ks[good], pos[good], base[good]
        if ks.size == 0:
            return np.zeros(0, dtype=np.complex64)
        frac = pos - base
        phase_f = frac * self.nfilts
        p0 = np.floor(phase_f).astype(np.int64)
        w = (phase_f - p0).astype(np.float32)
        p1 = np.minimum(p0 + 1, self.nfilts - 1)
        rel = base - self._buf_start
        frames = np.lib.stride_tricks.sliding_window_view(self._buf, tpp)[rel]
        coeffs = (
            self._bank[p0] * (1.0 - w)[:, None] + self._bank[p1] * w[:, None]
        )
        out = (frames * coeffs).sum(axis=-1).astype(np.complex64)
        self._k = int(ks[-1]) + 1
        # Discard inputs no future output can read.
        next_base = int(np.floor(self._k / self.rate))
        drop = max(0, next_base - self._buf_start)
        if drop:
            self._buf = self._buf[drop:]
            self._buf_start += drop
        return out

    def get_state(self) -> dict:
        return {
            "buf": self._buf.copy(),
            "buf_start": self._buf_start,
            "k": self._k,
        }

    def set_state(self, state: dict) -> None:
        self._buf = np.asarray(state["buf"], dtype=np.complex64).copy()
        self._buf_start = int(state["buf_start"])
        self._k = int(state["k"])
