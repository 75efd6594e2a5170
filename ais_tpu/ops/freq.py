"""Square-and-FFT frequency offset estimation + block derotation (AFC).

Equivalent of the reference's `square_and_fft_sync_cc` hier block
(reference: python/gmsk_sync.py:14-37) and its `freqest` kernel
(reference: lib/freqest_impl.cc:57-88):

  - squaring a GMSK signal collapses the +-bit_rate/2 modulation into two
    tones at 2*f_offset +- bit_rate;
  - a shifted `fftlen`-point FFT of each squared chunk is scanned for the
    bin pair spaced `fftlen * bit_rate / fs` apart with maximum
    |X[j]| + |X[j + offset]| energy;
  - the pair's center bin maps to Hz via (maxpos - fftlen/2) * binsize / 2
    (the /2 undoing the frequency doubling);
  - the stream is derotated by an NCO integrating -2*pi*f_est/fs per
    sample, one estimate held per chunk (`blocks.repeat` +
    `analog.frequency_modulator_fc` in the reference).

All chunks across the batch estimate in parallel via one batched FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def freqest(
    squared_chunks: jax.Array,
    sample_rate: float,
    bit_rate: float,
) -> tuple[jax.Array, jax.Array]:
    """Frequency offset estimate per chunk of the *squared* signal.

    squared_chunks: (..., n_chunks, fftlen) complex — x^2 reshaped.
    Returns (est, confidence): (..., n_chunks) float32 Hz and the ratio of
    the winning pair energy to the mean spectrum level (a tone-to-floor
    measure; ~1-4 for noise, >>10 when a GMSK burst dominates the chunk).
    """
    fftlen = squared_chunks.shape[-1]
    offset = int(fftlen * (bit_rate / sample_rate))
    binsize = sample_rate / fftlen
    spec = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(squared_chunks, axis=-1), axes=-1))
    # Pair energy for every left-bin position j in [0, fftlen - offset).
    pair = spec[..., : fftlen - offset] + spec[..., offset:]
    maxpair = jnp.max(pair, axis=-1)
    maxpos = jnp.argmax(pair, axis=-1) + offset // 2
    est = ((maxpos - fftlen // 2) * (binsize / 2.0)).astype(jnp.float32)
    floor = 2.0 * jnp.mean(spec, axis=-1)
    confidence = (maxpair / jnp.maximum(floor, 1e-30)).astype(jnp.float32)
    return est, confidence


def gate_and_hold(est: jax.Array, confidence: jax.Array, min_ratio: float) -> jax.Array:
    """Forward-fill low-confidence estimates along the chunk axis.

    A mostly-noise chunk produces a random tone-pair position; applying it
    would corrupt the tail of a packet that straddles into the chunk (the
    reference has exactly this failure mode — its freqest output is
    ungated, lib/freqest_impl.cc:72-85).  Chunks whose tone-to-floor ratio
    is below `min_ratio` reuse the previous confident estimate instead.
    """
    confident = confidence >= min_ratio
    def step(carry, xs):
        e, ok = xs
        new = jnp.where(ok, e, carry)
        return new, new
    # Derive the initial carry from the data (not jnp.zeros) so its
    # device-varying type matches inside shard_map.
    held = jax.lax.scan(step, est[..., 0] * 0.0, (
        jnp.moveaxis(est, -1, 0), jnp.moveaxis(confident, -1, 0)
    ))[1]
    return jnp.moveaxis(held, 0, -1)


def derotate(x: jax.Array, est_hz: jax.Array, sample_rate: float, fftlen: int) -> jax.Array:
    """Apply the per-chunk AFC correction to the original signal.

    x: (..., n) complex with n % fftlen == 0; est_hz: (..., n // fftlen).
    The NCO phase accumulates across chunk boundaries exactly like the
    reference's frequency_modulator_fc (python/gmsk_sync.py:27).
    """
    n = x.shape[-1]
    inc = jnp.repeat(est_hz, fftlen, axis=-1) * (-2.0 * jnp.pi / sample_rate)
    phase = jnp.cumsum(inc, axis=-1)
    assert phase.shape[-1] == n, (phase.shape, x.shape)
    carrier = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return x * carrier


def square_and_fft_sync(
    x: jax.Array,
    sample_rate: float,
    bit_rate: float,
    fftlen: int,
    gate_ratio: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full AFC stage: returns (derotated x, per-chunk estimates in Hz).

    x: (..., n) complex with n a multiple of fftlen.  With `gate_ratio`
    set, low-confidence (noise-only) chunk estimates are replaced by the
    previous confident one (see `gate_and_hold`); None reproduces the
    reference's ungated behavior.
    """
    n = x.shape[-1]
    if n % fftlen != 0:
        raise ValueError(f"block length {n} not a multiple of fftlen {fftlen}")
    chunks = (x * x).reshape(*x.shape[:-1], n // fftlen, fftlen)
    est, confidence = freqest(chunks, sample_rate, bit_rate)
    if gate_ratio is not None:
        est = gate_and_hold(est, confidence, gate_ratio)
    return derotate(x, est, sample_rate, fftlen), est
