"""Preamble correlation and burst detection.

Equivalent of the in-repo `corr_est_cc` block
(reference: lib/corr_est_cc_impl.cc:164-279), re-shaped for batch tensor
processing:

  - the stream matched filter (overlap-save `fft_filter_ccc` of the
    time-reversed conjugated preamble, lib/corr_est_cc_impl.cc:58-63,77)
    becomes one whole-block FFT correlation;
  - the sequential threshold-crossing/walk-uphill peak scan
    (lib/corr_est_cc_impl.cc:195-204) becomes a vectorized local-maximum
    test with a +-sps non-max-suppression window (same effect: one
    detection per preamble, strongest sample wins);
  - the `corr_start`/`time_est`/`phase_est`/`corr_est` stream tags
    (lib/corr_est_cc_impl.cc:213-266) become a fixed-size tensor of
    per-burst records (index, fractional offset, phase, magnitude, valid).

Indexing: corr[i] = sum_k conj(p[k]) * x[i+k], so a peak at i means the
preamble starts at x[i] — the "tag back in time via history" trick of the
reference (lib/corr_est_cc_impl.cc:93-98) becomes plain index arithmetic.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ais_tpu.ops.window import sliding_max_centered


def autocorr_threshold(preamble: np.ndarray, threshold: float) -> float:
    """threshold * (sum |p|^2)^2 — reference lib/corr_est_cc_impl.cc:71-74."""
    energy = float(np.sum(np.abs(np.asarray(preamble)) ** 2))
    return float(threshold) * energy * energy


def matched_filter(x: jax.Array, preamble: np.ndarray) -> jax.Array:
    """Cross-correlation of x with the preamble waveform via FFT.

    x: (..., n) complex64; preamble: (L,).  Output: (..., n - L + 1),
    corr[i] = sum_k conj(p[k]) x[i+k].
    """
    n = x.shape[-1]
    p = np.asarray(preamble, dtype=np.complex64)
    length = int(p.size)
    nfft = 1 << (n - 1).bit_length()
    pf = np.conj(np.fft.fft(p, nfft)).astype(np.complex64)
    from ais_tpu.ops.cplx import const_complex

    corr = jnp.fft.ifft(jnp.fft.fft(x, nfft, axis=-1) * const_complex(pf), axis=-1)
    return corr[..., : n - length + 1].astype(jnp.complex64)


def detect_bursts(
    corr: jax.Array,
    threshold: float,
    nms_radius: int,
    max_bursts: int,
    core_len: int,
    cfar_k: float | None = None,
    mag2: jax.Array | None = None,
):
    """Find up to `max_bursts` preamble peaks in corr (1-D), earliest first.

    Only peaks with index in [1, core_len) are accepted, so halo'd block
    framing decodes boundary-straddling packets exactly once (the shard
    owning the preamble start owns the packet — SURVEY.md section 5.7).

    `cfar_k` adds a noise-floor-referenced acceptance path: a peak also
    passes when its power exceeds `cfar_k * mean(|corr|^2)` over the
    block (the effective threshold is min(absolute, CFAR)).  The
    reference's fixed `t*(sum_p_sq)^2` threshold (lib/corr_est_cc_impl.cc
    :71-74) assumes the AGC delivers full-scale bursts; near the noise
    floor the AGC normalizes to the NOISE envelope and the correlation
    peak falls far below the fixed threshold, so gr-ais-equivalent
    detection dies ~6 dB above where the matched filter could still see
    the preamble.  |corr|^2 under noise is exponential with mean
    sigma^2*E, so a peak > k*mean has per-sample false-alarm e^{-k}
    (~0.1 false peaks per 16k block at k=12) — and false peaks cost only
    a CRC-rejected deframe attempt.  None disables (reference-faithful).
    n_detected keeps overflow visible either way.

    Returns (positions i32, centers f32, phases f32, mags f32, valid bool,
    n_detected i32 scalar), the first five each (max_bursts,).  `centers`
    is the 3-point center-of-mass fractional peak offset in (-1, 1)
    (reference lib/corr_est_cc_impl.cc:219-227); `phases` the correlator
    phase at the peak (:247).  `n_detected` counts every accepted peak
    before the table cap so overflow (n_detected > max_bursts) is
    *visible* — the host logs it instead of silently truncating.
    """
    n = corr.shape[-1]
    if mag2 is None:
        mag2 = jnp.real(corr) ** 2 + jnp.imag(corr) ** 2
    thresh = jnp.float32(threshold)
    if cfar_k is not None:
        thresh = jnp.minimum(thresh, cfar_k * jnp.mean(mag2))
    left = jnp.concatenate([mag2[:1], mag2[:-1]])
    right = jnp.concatenate([mag2[1:], mag2[-1:]])
    is_peak = (mag2 > thresh) & (mag2 >= left) & (mag2 > right)
    # Non-max suppression over +-nms_radius: one detection per burst even
    # though the periodic training pattern produces sidelobe peaks every
    # 4 symbols (the reference instead re-seeds its timing loop on every
    # sidelobe tag it emits, lib/corr_est_cc_impl.cc:268-270).
    winmax = sliding_max_centered(mag2, nms_radius)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_peak &= mag2 == winmax
    is_peak &= (idx >= 1) & (idx < core_len) & (idx < n - 1)

    key = jnp.where(is_peak, idx, jnp.int32(n))
    sel = jax.lax.top_k(-key, max_bursts)[0] * -1  # smallest indices first
    valid = sel < n
    pos = jnp.clip(sel, 1, n - 2)

    m_prev = mag2[pos - 1]
    m_cur = mag2[pos]
    m_next = mag2[pos + 1]
    den = m_prev + m_cur + m_next
    centers = (m_prev + 2.0 * m_cur + 3.0 * m_next) / jnp.maximum(den, 1e-30) - 2.0
    peak_c = corr[pos]
    phases = jnp.arctan2(jnp.imag(peak_c), jnp.real(peak_c))
    return (
        pos.astype(jnp.int32),
        centers.astype(jnp.float32),
        phases.astype(jnp.float32),
        m_cur.astype(jnp.float32),
        valid,
        jnp.sum(is_peak.astype(jnp.int32)),
    )
