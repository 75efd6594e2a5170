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
    # DC notch: squaring anything non-circular (receiver DC offset — the
    # classic zero-IF artifact — or real-only content) piles energy into
    # the DC bin of the squared spectrum; the pair search then locks onto
    # it and reports a *confident* bogus estimate of -bit_rate/4, which
    # derotates every burst in the chunk into garbage.  A legitimate GMSK
    # tone pair only touches DC when |CFO| = bit_rate/2 (4.8 kHz — far
    # outside AIS channel tolerance), and even then only one bin of the
    # pair is lost.  The reference's freqest has this failure ungated
    # (lib/freqest_impl.cc:72-85).
    dc = fftlen // 2
    mask = jnp.ones(fftlen, spec.dtype).at[dc - 1 : dc + 2].set(0.0)
    spec = spec * mask
    # Pair energy for every left-bin position j in [0, fftlen - offset).
    pair = spec[..., : fftlen - offset] + spec[..., offset:]
    maxpair = jnp.max(pair, axis=-1)
    maxpos = jnp.argmax(pair, axis=-1) + offset // 2
    est = ((maxpos - fftlen // 2) * (binsize / 2.0)).astype(jnp.float32)
    floor = 2.0 * jnp.mean(spec, axis=-1)
    confidence = (maxpair / jnp.maximum(floor, 1e-30)).astype(jnp.float32)
    return est, confidence


def gate_and_hold(est: jax.Array, confidence: jax.Array, min_ratio: float) -> jax.Array:
    """Nearest-confident fill of low-confidence estimates per chunk.

    A mostly-noise chunk produces a random tone-pair position; applying it
    would corrupt the tail of a packet that straddles into the chunk (the
    reference has exactly this failure mode — its freqest output is
    ungated, lib/freqest_impl.cc:72-85).  Chunks whose tone-to-floor ratio
    is below `min_ratio` take the estimate of the NEAREST confident chunk
    (ties prefer the earlier one).  Nearest — not a forward hold — because
    a packet that *starts* in the tail of a chunk leaves too little energy
    there for confidence, yet the burst demod corrects that whole packet
    with this chunk's value (pipeline/receiver.py): the right estimate is
    in the next chunk, where the packet body lies, not in a stale hold
    from seconds of preceding noise.
    """
    confident = confidence >= min_ratio
    big = est.shape[-1] + 1

    def fill(e_seq, ok_seq):
        # Scan along axis 0; carry = (last confident estimate, distance).
        def step(carry, xs):
            ce, cd = carry
            e_k, ok_k = xs
            ne = jnp.where(ok_k, e_k, ce)
            nd = jnp.where(ok_k, 0, cd + 1)
            return (ne, nd), (ne, nd)
        # Derive carries from the data (not jnp.zeros) so device-varying
        # types match inside shard_map.
        init = (e_seq[0] * 0.0, jnp.int32(0) * ok_seq[0].astype(jnp.int32) + big)
        return jax.lax.scan(step, init, (e_seq, ok_seq))[1]

    e_seq = jnp.moveaxis(est, -1, 0)
    ok_seq = jnp.moveaxis(confident, -1, 0)
    fwd_e, fwd_d = fill(e_seq, ok_seq)
    bwd_e, bwd_d = jax.tree.map(
        lambda t: t[::-1], fill(e_seq[::-1], ok_seq[::-1])
    )
    held = jnp.where(bwd_d < fwd_d, bwd_e, fwd_e)
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
