"""Feedforward (non-iterative) burst timing recovery via the MSK tone pair.

A TPU-first alternative to the reference's sequential D'Andrea PLL
(lib/msk_timing_recovery_cc_impl.cc:138-202; our faithful port is
`sync/timing.py`).  Squaring an MSK/GMSK signal produces two spectral
tones at +-Rs/2 (the same physics the reference's freqest exploits,
lib/freqest_impl.cc:72-85).  The *phases* of those tones encode the
symbol clock: for a delay tau, each tone at f+- picks up -2*pi*f*tau, so

    psi = arg( C+ * conj(C-) ) = psi0 - 2*pi*tau/T

where C+- are correlations of x^2 against e^{-+j*pi*n/sps}.  Two dot
products per segment therefore give the symbol phase to sub-sample
accuracy, a weighted linear fit across segments tracks clock-rate
offset, and symbol extraction becomes one batched 8-tap interpolation —
no sequential state at all.  A common frequency offset shifts both tones
equally and cancels in the product, so the estimator is unbiased under
residual AFC error.

The mapping from tone phase to absolute symbol-center position is fixed
by a one-time numpy calibration against this package's own modulator
(`_calibrate`), which also measures the optimum sampling point the same
way an eye diagram would.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ais_tpu.ops.framing import frame_overlap_big
from ais_tpu.ops.interp import DELAY, NSTEPS, NTAPS, interp_taps


def _tone_psi(x: np.ndarray, sps: float) -> float:
    n = np.arange(x.size)
    theta = np.pi / sps
    z = x.astype(np.complex128) ** 2
    cp = np.sum(z * np.exp(-1j * theta * n))
    cm = np.sum(z * np.exp(+1j * theta * n))
    return float(np.angle(cp * np.conj(cm)))


@functools.lru_cache(maxsize=8)
def _calibrate(sps_int: int, bt: float) -> float:
    """Return `delta` such that symbol centers sit at positions
    p = delta - psi * sps / (2*pi)  (mod sps) for a measured tone phase
    psi.  Calibrated on clean modulated data from ais_tpu.tx.gmsk."""
    from ais_tpu.tx.gmsk import modulate_bits

    rng = np.random.default_rng(12345)
    bits = rng.integers(0, 2, 600)
    x = np.asarray(modulate_bits(bits, sps_int, bt)).astype(np.complex128)
    # Eye-open search: the sampling offset maximizing the mean |phase
    # step| between consecutive symbol-spaced samples.
    bank = interp_taps()
    best_q, best_m = 0.0, -1.0
    for qi in range(int(sps_int * 20)):
        q = qi / 20.0
        pos = np.arange(100 + q, x.size - 20, sps_int)
        i0 = np.floor(pos).astype(int)
        mu = pos - i0
        rows = bank[np.round(mu * NSTEPS).astype(int)]
        frames = x[(i0 - DELAY)[:, None] + np.arange(NTAPS)[None, :]]
        ys = (frames * rows).sum(axis=1)
        m = np.abs(np.angle(ys[1:] * np.conj(ys[:-1]))).mean()
        if m > best_m:
            best_m, best_q = m, q
    psi = _tone_psi(x[100:-100], sps_int)
    # centers at best_q (mod sps) when tone phase is psi:
    # best_q = delta - psi*sps/(2*pi)  ->  delta = best_q + psi*sps/(2*pi)
    return float(np.mod(best_q + psi * sps_int / (2 * np.pi), sps_int))


def refine_freq(
    burst: jax.Array,
    sps: float,
    seg_len: int = 256,
    min_weight_frac: float = 0.25,
) -> jax.Array:
    """Fine residual-carrier estimate (Hz * 2pi/fs, i.e. rad/sample).

    The +Rs/2 tone of x^2 sits at theta + 2*w0 (theta = pi/sps known);
    its phase advances (theta + 2*w0)*seg_len per segment, so the wrapped
    segment-to-segment phase slope of C+ yields w0 with ~Hz accuracy —
    enough to make a packet-length coherent demod possible (the AFC's
    binsize/2 quantization alone leaves ~10 rad of drift over a packet).
    Unambiguous for |w0| < pi/(2*seg_len) (~±46 Hz at 48 ksps, seg 256).
    """
    length = burst.shape[-1]
    n_segs = length // seg_len
    theta = np.pi / sps
    n = np.arange(length)
    from ais_tpu.ops.cplx import const_complex

    tone_p = const_complex(np.exp(-1j * theta * n).astype(np.complex64))
    z = burst * burst
    zp = (z * tone_p)[: n_segs * seg_len].reshape(n_segs, seg_len)
    cp = jnp.sum(zp, axis=-1)
    w = jnp.abs(cp)
    prod = cp[1:] * jnp.conj(cp[:-1])
    ww = jnp.sqrt(w[1:] * w[:-1])
    ww = jnp.where(ww >= min_weight_frac * jnp.max(ww), ww, 0.0)
    # arg(prod) = 2*w0*seg_len (theta*seg_len contribution is exact and
    # cancels in the conjugate product since the tone reference removes
    # theta already).
    slope = jnp.angle(jnp.sum(prod * (ww / jnp.maximum(jnp.sum(ww), 1e-12))))
    return (slope / (2.0 * seg_len)).astype(jnp.float32)


def estimate_timing(
    burst: jax.Array,
    sps: float,
    bt: float = 0.4,
    seg_len: int = 256,
    min_weight_frac: float = 0.25,
):
    """Tone-phase timing estimate: (base, intercept, slope).

    Symbol centers sit at p_k = base + k*sps + intercept + slope*(...)
    (see feedforward_symbols for the exact grid construction).
    """
    length = burst.shape[-1]
    n_segs = length // seg_len
    sps_int = int(round(sps))
    delta = _calibrate(sps_int, bt)
    theta = np.pi / sps

    n = np.arange(length)
    from ais_tpu.ops.cplx import const_complex

    tone_p = const_complex(np.exp(-1j * theta * n).astype(np.complex64))
    tone_m = const_complex(np.exp(+1j * theta * n).astype(np.complex64))

    z = burst * burst
    zp = (z * tone_p)[: n_segs * seg_len].reshape(n_segs, seg_len)
    zm = (z * tone_m)[: n_segs * seg_len].reshape(n_segs, seg_len)
    cp = jnp.sum(zp, axis=-1)
    cm = jnp.sum(zm, axis=-1)
    prod = cp * jnp.conj(cm)
    psi = jnp.angle(prod)
    w = jnp.sqrt(jnp.abs(prod))
    w = jnp.where(w >= min_weight_frac * jnp.max(w), w, 0.0)

    tau = delta - psi * (sps / (2.0 * np.pi))
    conf = w > 0

    def _ffill(carry, xs):
        t, ok = xs
        new = jnp.where(ok, t, carry)
        return new, new

    tau_f = jax.lax.scan(_ffill, tau[0], (tau, conf))[1]
    first_idx = jnp.argmax(conf)
    tau0 = tau_f[first_idx]
    d = tau_f[1:] - tau_f[:-1]
    d = d - sps * jnp.round(d / sps)
    un = jnp.concatenate([jnp.zeros(1, tau.dtype), jnp.cumsum(d)])
    dtau = un - un[first_idx]
    centers = (jnp.arange(n_segs) + 0.5) * seg_len
    wsum = jnp.sum(w) + 1e-12
    cbar = jnp.sum(w * centers) / wsum
    tbar = jnp.sum(w * dtau) / wsum
    cov = jnp.sum(w * (centers - cbar) * (dtau - tbar))
    var = jnp.sum(w * (centers - cbar) ** 2) + 1e-12
    slope = cov / var
    intercept = tbar - slope * cbar
    base = tau0 + jnp.ceil((DELAY + 1.0 - tau0) / sps) * sps
    return base, intercept, slope


def feedforward_symbols_fft(
    burst: jax.Array,
    sps: float,
    n_symbols: int,
    bt: float = 0.4,
    seg_len: int = 256,
    min_weight_frac: float = 0.25,
):
    """Gather-free symbol extraction: FFT fractional delay + strided comb.

    The bank-interpolation path (`feedforward_symbols`) issues one 8-tap
    gather per symbol, which serializes on the TPU backend.  Here the
    burst is delayed by the (single) fractional timing offset in the
    frequency domain — ideal sinc interpolation, one batched FFT/IFFT —
    and symbols are read off a stride-`sps` comb chosen from a handful of
    static integer offsets by a one-hot sum.  Assumes integer sps and
    negligible clock drift across one burst (<~100 ppm; the AIS spec
    allows 50).  The exact drift-tracking path remains the default on CPU.
    """
    length = burst.shape[-1]
    sps_i = int(round(sps))
    base, intercept, _ = estimate_timing(
        burst, sps, bt=bt, seg_len=seg_len, min_weight_frac=min_weight_frac
    )
    tau = base + intercept
    # Clamp into the candidate comb range below: under extreme drift or
    # noise |intercept| can push floor(tau) outside it, and an unclamped
    # one-hot would silently select *no* comb (all-zero symbols with
    # valid=True).  Clamped, a bad estimate degrades to a CRC failure
    # instead of an invisible zero burst.
    r0 = DELAY
    n_cand = sps_i + 2
    tau = jnp.clip(tau, float(r0), float(r0 + n_cand) - 1e-3)
    R = jnp.floor(tau).astype(jnp.int32)
    mu = tau - R.astype(jnp.float32)
    nfft = 1 << (length - 1).bit_length()
    F = jnp.fft.fft(burst, nfft)
    kf = jnp.asarray(np.fft.fftfreq(nfft).astype(np.float32)) * nfft
    ph = (2.0 * np.pi / nfft) * kf * mu
    delayed = jnp.fft.ifft(F * jax.lax.complex(jnp.cos(ph), jnp.sin(ph)))[:length]

    # Candidate integer offsets: base lies in [DELAY+1, DELAY+1+sps), and
    # intercept can push floor(tau) one either side.
    views = []
    for c in range(n_cand):
        start = r0 + c
        v = delayed[start : start + sps_i * n_symbols]
        views.append(v.reshape(n_symbols, sps_i)[:, 0])
    views = jnp.stack(views)                      # (n_cand, n_symbols)
    oh = (R == (r0 + jnp.arange(n_cand, dtype=jnp.int32))).astype(jnp.float32)
    symbols = jnp.sum(views * oh[:, None], axis=0)
    kpos = R.astype(jnp.float32) + jnp.arange(n_symbols, dtype=jnp.float32) * sps_i
    valid = (kpos >= 0) & (kpos + sps_i + 8 <= length)
    return symbols.astype(jnp.complex64), valid


def feedforward_symbols_fir(
    burst: jax.Array,
    sps: float,
    n_symbols: int,
    bt: float = 0.4,
    seg_len: int = 256,
    min_weight_frac: float = 0.25,
):
    """Gather-free symbol extraction: 8-tap bank-row FIR + strided comb.

    Same single-delay-per-burst assumption as `feedforward_symbols_fft`
    (intra-burst drift negligible; AIS allows 50 ppm and both paths are
    tested at that), but the fractional delay is applied with the SAME
    8-tap Blackman-sinc interpolation bank the drift-tracking path uses,
    and the whole extraction collapses into ONE per-burst FIR:

        symbols[k] = sum_j g[j] * burst[sps*k + j],   len(g) = sps+9

    where g is the (outer-product) convolution of the bank row picked by
    the fractional phase mu (one-hot over the bank's 129 phases — an MXU
    contraction, no gather) with the one-hot of the integer comb offset.
    The strided reads become one gather-free `frame_overlap_big` framing
    (core = sps) plus a single small contraction — two passes over the
    burst instead of the FFT path's zero-padded 2^k FFT/IFFT pair
    (8192-pt for the default 4608-sample window) or a chain of shifted
    slice-adds XLA won't fuse (tools/tpu_symbols_probe.py).  Accuracy is
    identical in kind: `_calibrate` measures the optimum sampling point
    *with this bank*, so the bank's group delay is baked into `delta`.
    """
    length = burst.shape[-1]
    sps_i = int(round(sps))
    base, intercept, _ = estimate_timing(
        burst, sps, bt=bt, seg_len=seg_len, min_weight_frac=min_weight_frac
    )
    tau = base + intercept
    # Same clamp as the FFT path: a wild estimate degrades to a CRC
    # failure, never a silent all-zero burst.
    r0 = DELAY
    n_cand = sps_i + 2
    tau = jnp.clip(tau, float(r0), float(r0 + n_cand) - 1e-3)
    R = jnp.floor(tau).astype(jnp.int32)
    mu = tau - R.astype(jnp.float32)

    nz = n_cand - 1 + sps_i * n_symbols  # last comb sample we ever read
    if nz > length - NTAPS + 1:
        raise ValueError(
            f"burst window {length} too short for {n_symbols} symbols "
            f"at sps {sps_i} (needs {nz + NTAPS - 1})"
        )
    bank = jnp.asarray(interp_taps())  # (NSTEPS+1, NTAPS)
    imu = jnp.clip(jnp.round(mu * NSTEPS).astype(jnp.int32), 0, NSTEPS)
    oh_mu = (
        imu == jnp.arange(NSTEPS + 1, dtype=jnp.int32)
    ).astype(jnp.float32)
    row = oh_mu @ bank  # (NTAPS,)

    # Fuse interpolation row and comb offset: symbols[k] = z[c + sps*k]
    # with z[i] = sum_t row[t]*burst[i+t] and c = R - DELAY, i.e. one
    # J-tap kernel g[j] = sum_{t+c'=j} row[t]*oh_c[c'].
    oh_c = (
        (R - r0) == jnp.arange(n_cand, dtype=jnp.int32)
    ).astype(jnp.float32)
    J = n_cand - 1 + NTAPS
    g = jnp.zeros((J,), jnp.float32)
    for c in range(n_cand):
        g = g + oh_c[c] * jnp.pad(row, (c, J - NTAPS - c))

    # Gather-free strided frames: frames[m, j] = burst[sps*m + j].
    nfr = length - (length % sps_i)
    fre = frame_overlap_big(jnp.real(burst)[:nfr], sps_i, J - sps_i)
    fim = frame_overlap_big(jnp.imag(burst)[:nfr], sps_i, J - sps_i)
    symbols = jax.lax.complex(
        jnp.einsum("mj,j->m", fre[:n_symbols], g),
        jnp.einsum("mj,j->m", fim[:n_symbols], g),
    )
    kpos = R.astype(jnp.float32) + jnp.arange(n_symbols, dtype=jnp.float32) * sps_i
    valid = (kpos >= 0) & (kpos + sps_i + 8 <= length)
    return symbols.astype(jnp.complex64), valid


def feedforward_symbols(
    burst: jax.Array,
    sps: float,
    n_symbols: int,
    bt: float = 0.4,
    seg_len: int = 256,
    min_weight_frac: float = 0.25,
    path: str = "auto",
):
    """Recover `n_symbols` symbol-rate samples from one burst window.

    Returns (symbols complex64 (n_symbols,), valid bool (n_symbols,)).
    Drop-in replacement for the PLL's outputs (same downstream demod).
    `path`: "auto" picks the gather-free bank-FIR comb on non-CPU
    backends when sps is integral (see feedforward_symbols_fir), the
    drift-tracking bank interpolation otherwise; "fir"/"fft"/"bank"
    force a formulation ("fft" is the older transform-domain comb,
    kept selectable for cross-checks).
    """
    gather_free = {
        "auto": jax.default_backend() != "cpu",
        "fft": True,
        "fir": True,
        "bank": False,
    }[path]
    if gather_free and abs(sps - round(sps)) < 1e-9:
        fn = feedforward_symbols_fft if path == "fft" else feedforward_symbols_fir
        return fn(
            burst, sps, n_symbols, bt=bt, seg_len=seg_len,
            min_weight_frac=min_weight_frac,
        )
    length = burst.shape[-1]
    base, intercept, slope = estimate_timing(
        burst, sps, bt=bt, seg_len=seg_len, min_weight_frac=min_weight_frac
    )
    # Symbol-center positions: nominal grid anchored at base, corrected by
    # the drift line.
    k = jnp.arange(n_symbols, dtype=jnp.float32)
    pos = base + k * sps
    pos = pos + intercept + slope * pos
    i0 = jnp.floor(pos).astype(jnp.int32)
    mu = pos - i0
    valid = (i0 - DELAY >= 0) & (i0 - DELAY + NTAPS <= length)
    i0c = jnp.clip(i0 - DELAY, 0, length - NTAPS)

    bank = jnp.asarray(interp_taps())
    rows = bank[jnp.clip(jnp.round(mu * NSTEPS).astype(jnp.int32), 0, NSTEPS)]
    frames = burst[i0c[:, None] + jnp.arange(NTAPS)[None, :]]
    symbols = jnp.sum(frames * rows, axis=-1)
    return symbols.astype(jnp.complex64), valid
