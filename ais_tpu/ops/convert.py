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


# Lloyd-Max optimal 4-level quantizer for a unit-variance Gaussian
# source (Max 1960): decision thresholds at {-t, 0, +t}, reconstruction
# levels at {-b, -a, +a, +b}.  The wideband capture at full channel
# load is a dense carrier sum, near-Gaussian per component, so these
# levels minimize quantization noise power for a 2-bit wire.
CI2_THRESH = 0.9816
CI2_INNER = 0.4528
CI2_OUTER = 1.5104


def iq_from_bytes_ci2(raw_u8: jax.Array) -> jax.Array:
    """(n/2,) uint8, each byte = I0 Q0 I1 Q1 as 2-bit codes (MSB-first)
    -> (n,) complex64.

    ci2 is an AGC'd format: the encoder (host_bytes) normalizes each
    buffer to unit per-component RMS before quantizing with the
    Lloyd-Max thresholds, so code c decodes to the matching Lloyd-Max
    level sign(c - 1.5) * (CI2_INNER or CI2_OUTER).  Real 2-bit SDR
    links (e.g. GPS front ends) run exactly this AGC-to-the-quantizer
    loop in hardware.  Arithmetic-only mapping — no table gather
    (ARCHITECTURE.md §4 backend rules).
    """
    v = raw_u8.astype(jnp.int32)
    f = [(v >> s) & 3 for s in (6, 4, 2, 0)]  # I0 Q0 I1 Q1
    re = jnp.stack([f[0], f[2]], axis=-1).reshape(v.shape[-1] * 2)
    im = jnp.stack([f[1], f[3]], axis=-1).reshape(v.shape[-1] * 2)

    def dec(c):
        m = c.astype(jnp.float32) - 1.5  # {-1.5, -0.5, +0.5, +1.5}
        mag = jnp.where(jnp.abs(m) > 1.0, CI2_OUTER, CI2_INNER)
        return jnp.sign(m) * mag

    return jax.lax.complex(dec(re), dec(im))


# ci1 encoder headroom: the 99.9th-percentile component amplitude maps
# to this fraction of the 1-bit quantizer level.  PEAK-referenced (not
# RMS): a sparse scene's RMS is set by the quiet gaps, and RMS-scaling
# would drive bursts deep into sigma-delta overload — peak-referencing
# keeps the loop linear for sparse AND dense traffic (26 dB near-far
# and full-load parity both hold at 1.0; tests/test_convert_ci1.py,
# tests/test_wideband.py).
CI1_HEADROOM = 0.7
# Back-compat alias (the decoder's ±1 levels are scale-free).
CI1_GAIN = CI1_HEADROOM
# cr1's second-order loop wants more stability margin than the
# first-order ci1 pair: full-load content parity is 1.0 at 0.5-0.6 and
# 0.8 but drops a marginal packet at 0.7 (decision-noise edge, measured
# on the bench scene) — 0.6 sits in the clean region with SNR to spare.
# (tools/wire_sweep.py's round-4 margin map shows parity 0.997-1.000
# across the whole 0.35-0.90 range: headroom is not a binding variable.)
CR1_HEADROOM = 0.6
# cr1 NTF z^-2 coefficient (NTF = 1 + a2 z^-2 + z^-4).  a2 = 2 doubles
# both zeros at exactly fs/4; splitting them onto the two AIS channels
# (zeros at fs/4 ± 25/2400·fs, a2 = 2 - 4cos²(2π(1/4 - 25e3/2.4e6)))
# lowers the in-band quantization noise ~7 dB at the same loop
# structure and a marginally LOWER NTF ∞-norm (3.98 vs 4.0) — a pure
# encoder upgrade: the wire layout and the ±1 decoder are unchanged.
import math as _math

CR1_A2 = 2.0 - 4.0 * _math.cos(2.0 * _math.pi * (0.25 - 25e3 / 2.4e6)) ** 2


def iq_from_bytes_ci1(raw_u8: jax.Array) -> jax.Array:
    """(n/4,) uint8 sigma-delta 1-bit IQ -> (n,) complex64 (levels ±1).

    Wire layout (host_bytes / native sigma_delta_ci1): 4 complex samples
    per byte, MSB-first I0 Q0 I1 Q1 I2 Q2 I3 Q3.  The decoder is a plain
    ±1 mapping — all the intelligence is in the ENCODER's first-order
    noise shaping, which pushes the 1-bit quantization noise above the
    AIS channel band (< ±36 kHz of a 2.4 Msps capture, OSR ≈ 33) where
    the channelizer's 11 kHz low-pass removes it.  This is exactly the
    1-bit sigma-delta front-end architecture of commodity ADCs; at full
    channel load content parity is 1.0 where hard limiting (no shaping)
    loses >3% of packets (tests/test_convert_ci1.py).
    """
    v = raw_u8.astype(jnp.int32)
    f = [(v >> s) & 1 for s in (7, 5, 3, 1)]  # I0..I3
    g = [(v >> s) & 1 for s in (6, 4, 2, 0)]  # Q0..Q3
    re = jnp.stack(f, axis=-1).reshape(v.shape[-1] * 4)
    im = jnp.stack(g, axis=-1).reshape(v.shape[-1] * 4)
    lvl = lambda b: b.astype(jnp.float32) * 2.0 - 1.0  # noqa: E731
    return jax.lax.complex(lvl(re), lvl(im))


def _sigma_delta_ci1_numpy(iq: np.ndarray, scale: float) -> np.ndarray:
    """Pure-numpy twin of native.sigma_delta_ci1 (slow; tests + fallback)."""
    re = iq.real.astype(np.float64) * scale
    im = iq.imag.astype(np.float64) * scale
    bits = np.empty(2 * iq.size, np.uint8)  # I0 Q0 I1 Q1 ... transmission order
    ei = eq = 0.0
    for n in range(iq.size):
        si = re[n] + ei
        sq = im[n] + eq
        bi = 1 if si >= 0 else 0
        bq = 1 if sq >= 0 else 0
        ei = min(4.0, max(-4.0, si - (2 * bi - 1)))
        eq = min(4.0, max(-4.0, sq - (2 * bq - 1)))
        bits[2 * n] = bi
        bits[2 * n + 1] = bq
    return np.packbits(bits)


def _prefix_xor_bytes(v: jax.Array) -> jax.Array:
    """Inclusive prefix-XOR along a 1-D uint8/int32 vector, by log-doubling
    (pad-front + static slice + xor only — every step is on the tunnel
    backend's safe-op list; cumsum can lower via reduce_window, which is
    not, ARCHITECTURE.md §4)."""
    n = v.shape[0]
    s = 1
    while s < n:
        v = v ^ jnp.pad(v, (s, 0))[:n]
        s <<= 1
    return v


def _spread8(b: jax.Array) -> jax.Array:
    """Spread the 8 bits of each byte to the even bit positions of an
    int32 (bit j -> bit 2j); the standard Morton interleave half."""
    t = b & 0xFF
    t = (t | (t << 4)) & 0x0F0F
    t = (t | (t << 2)) & 0x3333
    t = (t | (t << 1)) & 0x5555
    return t


def ci1_from_bytes_cd1(raw_u8: jax.Array, n_samples: int) -> jax.Array:
    """cd1 wire bytes -> ci1 wire bytes, on device (pure elementwise +
    log-depth prefix; fuses ahead of the ci1 ingest kernels).

    cd1 is the ENTROPY-SHAPED framing of the ci1 sigma-delta stream for
    compressing transports (the dev tunnel compresses h2d, so the ingest
    budget is the wire's compressibility — tools/tpu_link_probe.py):
    the I and Q bit planes are separated and first-order delta-coded
    (bit[k] XOR bit[k-1]), which exposes the oversampled sigma-delta
    stream's run structure to a byte-level LZ (zlib-1: 0.544 vs 0.665
    for the interleaved layout on the full-load bench scene).  Same
    byte count as ci1 (+1 pad byte when n % 8 == 4); information
    content identical — the transform is exactly invertible here.

    Layout: [packbits(delta I bits), ceil(n/8) bytes]
            [packbits(delta Q bits), ceil(n/8) bytes], MSB-first.
    Per-BUFFER framing (the planes split at the buffer midpoint), so
    cd1 is a step-framed device-ingest format, not a resumable file
    stream format like ci1 (io/sources.py).
    """
    nb = -(-n_samples // 8)
    v = raw_u8.astype(jnp.int32)

    def plane(d):
        # In-byte inclusive prefix-XOR, MSB-first (bit j of out = XOR of
        # bits 0..j), then carry the parity of all previous bytes.
        x = d ^ (d >> 1)
        x = x ^ (x >> 2)
        x = x ^ (x >> 4)
        parity = x & 1
        carry_prev = _prefix_xor_bytes(parity) ^ parity  # exclusive
        return x ^ (carry_prev * 0xFF)

    i_bytes = plane(v[:nb])
    q_bytes = plane(v[nb : 2 * nb])
    o16 = (_spread8(i_bytes) << 1) | _spread8(q_bytes)
    pair = jnp.stack([(o16 >> 8) & 0xFF, o16 & 0xFF], axis=-1)
    return pair.reshape(2 * nb).astype(jnp.uint8)[: n_samples // 4]


def iq_from_bytes_cd1(raw_u8: jax.Array, n_samples: int) -> jax.Array:
    """(2*ceil(n/8),) cd1 bytes -> (n,) complex64 (levels ±1)."""
    return iq_from_bytes_ci1(ci1_from_bytes_cd1(raw_u8, n_samples))


def cd1_bytes_from_ci1(ci1_bytes: np.ndarray, n_samples: int) -> np.ndarray:
    """Host-side ci1 -> cd1 transform (see ci1_from_bytes_cd1)."""
    bits = np.unpackbits(np.asarray(ci1_bytes, np.uint8))[: 2 * n_samples]
    i_bits, q_bits = bits[0::2], bits[1::2]

    def delta(b):
        d = b.copy()
        d[1:] ^= b[:-1]
        return np.packbits(d)

    return np.concatenate([delta(i_bits), delta(q_bits)])


def cd1_wire_nbytes(n_samples: int) -> int:
    """Wire bytes for one n-sample cd1 step (two padded bit planes)."""
    return 2 * (-(-n_samples // 8))


def iq_from_bytes_cr1(raw_u8: jax.Array, n_samples: int) -> jax.Array:
    """(ceil(n/8),) cr1 bytes -> (n,) complex64 baseband.

    cr1 is the 1-bit-per-complex-sample wire: the encoder shifts the
    baseband to an fs/4 IF (multiply by j^n), keeps the REAL part, and
    noise-shapes the 1-bit quantization error with a second-order
    BANDPASS sigma-delta (NTF = (1+z^-2)^2, zeros at ±fs/4) — so the
    AIS channels at IF ± 25 kHz sit inside the shaping notch.  8 real
    samples/byte, MSB-first: HALF the wire bytes of ci1 for the same
    sample rate, which matters because the ingest link, not the chip,
    binds end-to-end throughput (ARCHITECTURE.md §5, STATUS.md).

    The decoder maps bits to ±1 and downconverts by (-j)^n back to
    baseband: the wanted sideband lands at DC, the mirror at fs/2, and
    the shaped quantization noise away from the channel offsets — the
    standard channelizer low-pass (11 kHz at ±25 kHz offsets) removes
    both, so everything downstream of this function is IDENTICAL to the
    other wire formats (same channelizer config, same positions).
    In-band cost vs ci1: one noise-shaping notch must cover both
    channels (≈ ±36 kHz of IF) instead of two independent lowpass
    loops, hence the second-order NTF; full-load content parity stays
    1.0 (tests/test_convert_cr1.py).
    """
    v = raw_u8.astype(jnp.int32)
    bits = jnp.stack([(v >> s) & 1 for s in (7, 6, 5, 4, 3, 2, 1, 0)], axis=-1)
    r = bits.reshape(v.shape[-1] * 8)[:n_samples].astype(jnp.float32) * 2.0 - 1.0
    # (-j)^n: re = r*cos(-pi n/2) = r*[1,0,-1,0]; im = r*[0,-1,0,1].
    n4 = -(-n_samples // 4)
    re_pat = jnp.tile(jnp.array([1.0, 0.0, -1.0, 0.0], jnp.float32), n4)[:n_samples]
    im_pat = jnp.tile(jnp.array([0.0, -1.0, 0.0, 1.0], jnp.float32), n4)[:n_samples]
    return jax.lax.complex(r * re_pat, r * im_pat)


def _sigma_delta_cr1_numpy(
    iq: np.ndarray, scale: float, a2: float = 2.0
) -> np.ndarray:
    """Pure-numpy twin of native.sigma_delta_cr1 (slow; tests + fallback).

    All arithmetic is float32 in the C++ order of evaluation: the
    loop is decision-sensitive, so a float64 twin diverges from the
    native stream after a few thousand samples.
    """
    n = iq.size
    # Re(iq[n] * j^n): cycles re, -im, -re, im.
    x = np.empty(n, np.float32)
    x[0::4] = iq.real[0::4]
    x[1::4] = -iq.imag[1::4]
    x[2::4] = -iq.real[2::4]
    x[3::4] = iq.imag[3::4]
    x *= np.float32(scale)  # C++: x * scale, float32
    bits = np.empty(n, np.uint8)
    f = np.float32
    one, a2f, four = f(1.0), f(a2), f(4.0)
    e1 = e2 = e3 = e4 = f(0.0)
    for k in range(n):
        si = (x[k] - a2f * e2) - e4
        b = bool(si >= 0.0)
        bits[k] = b
        e0 = si - (one if b else -one)
        e0 = np.minimum(four, np.maximum(-four, e0))
        e4, e3, e2, e1 = e3, e2, e1, e0
    return np.packbits(bits)


def cr1_wire_nbytes(n_samples: int) -> int:
    """Wire bytes for one n-sample cr1 step (last byte zero-padded)."""
    return -(-n_samples // 8)


def wire_format_envelope(
    iq: np.ndarray,
    rate: float = 2.4e6,
    offsets: tuple = (-25e3, +25e3),
    band_hz: float = 15e3,
) -> dict:
    """Capture statistics the 1-bit wire formats' envelopes are judged by.

    Returns:
      near_far_db — in-band power ratio between the strongest and the
        weakest ACTIVE channel (0 when fewer than two channels are
        above the noise floor, so an idle channel never trips the
        near-far guard).
      interferer_db — strongest narrowband out-of-band feature vs the
        strongest in-band feature (smoothed PSD peaks).  A positive
        value means something outside the AIS channels dominates the
        capture and will set the peak-referenced sigma-delta scale.
      channel_snr_db — per channel: peak over chunks of the in-band
        tone-to-floor ratio, 10*log10(noise-subtracted in-band power /
        in-band noise power), -99 when the channel never registered
        activity.  This is the proxy the sensitivity gate judges
        (select_wire_format): measured against calibrated AWGN scenes
        (wire_sweep.py part 2's Eb/N0 convention) it tracks
        Eb/N0 - ~3.9 dB with unit slope over the 10-30 dB decode range
        (the in-band window integrates ~30 kHz of noise against a
        9600 bit/s GMSK tone; tests/test_wire_select.py pins the
        calibration).
    """
    # PSDs over chunks spread across the WHOLE buffer, judged PER CHUNK:
    # AIS traffic is bursty (a packet is ~27 ms), so whole-capture power
    # integration dilutes a weak burst below the noise floor and a
    # leading-chunk-only analysis can miss every transmission.  Activity
    # and channel power are per-chunk peaks (noise-subtracted), so a
    # single weak burst anywhere in the buffer counts at its in-burst
    # strength.
    n = min(int(iq.size), 1 << 17)  # ~55 ms at 2.4 Msps: one burst fits
    # 75%-overlapped chunks (hop n/4): a ~27 ms burst then sits within
    # ±n/8 of SOME chunk's center, bounding its Hanning edge loss to
    # ~1 dB — with the old disjoint chunks a burst straddling a chunk
    # boundary read up to ~10 dB low and spuriously tripped the
    # sensitivity gate.  Beyond the 48-chunk cap (captures > ~0.7 s)
    # chunks spread evenly: the statistics become a sample, which bursty
    # AIS traffic (one packet per slot per vessel) keeps representative.
    n_chunks = max(1, min(48, 1 + 4 * (int(iq.size) - n) // n))
    win = np.hanning(n).astype(np.float32)
    freqs = np.fft.fftfreq(n, 1.0 / rate)
    masks = [np.abs(freqs - off) <= band_hz for off in offsets]
    in_mask = np.zeros(n, bool)
    for m in masks:
        in_mask |= m
    # ~1 kHz smoothing: an interferer is a narrowband feature, not a bin.
    w = max(int(1e3 / rate * n), 1)
    kern = np.ones(w) / w
    tiny = 1e-30
    ch_peak = [0.0] * len(offsets)
    ch_active = [False] * len(offsets)
    ch_dominant = [False] * len(offsets)
    ch_snr = [-99.0] * len(offsets)
    interferer_db = -np.inf
    # A transmission's own spectral skirt lands in the ADJACENT channel
    # ~40-46 dB down (GMSK BT=0.4 at 2x the channel spacing, plus burst
    # ramps): in-band power within this bound of a same-chunk stronger
    # channel is that channel's skirt, not a second transmission, and
    # must not register as near-far "activity" (a lone strong
    # transmitter would otherwise force a permanent ci8 fallback).
    SKIRT_BOUND = 1e-4  # -40 dBc
    for c in range(n_chunks):
        start = (int(iq.size) - n) * c // max(n_chunks - 1, 1)
        x = np.asarray(iq[start : start + n], np.complex64) * win
        psd = np.abs(np.fft.fft(x)) ** 2
        floor = float(np.median(psd))  # per-bin noise floor, this chunk
        p_sub = []
        for m in masks:
            nb = int(m.sum())
            p = float(psd[m].sum())
            p_sub.append(p - floor * nb if p > 3.0 * floor * nb else 0.0)
        strongest = max(p_sub)
        for ci, (p, m) in enumerate(zip(p_sub, masks)):
            if p > 0.0 and p > SKIRT_BOUND * strongest:
                ch_active[ci] = True
                ch_peak[ci] = max(ch_peak[ci], p)
                if p == strongest:
                    # Dominant in its own slot's chunk: a genuine
                    # transmission, however weak globally (AIS is TDMA —
                    # a far vessel owns its slot while the near one is
                    # silent).  Exempt from the global skirt post-pass.
                    ch_dominant[ci] = True
                nb = int(m.sum())
                ch_snr[ci] = max(
                    ch_snr[ci],
                    10.0 * np.log10(p / max(floor * nb, tiny)),
                )
        sm = np.convolve(psd, kern, mode="same")
        peak_in = float(sm[in_mask].max()) if in_mask.any() else tiny
        peak_out = float(sm[~in_mask].max()) if (~in_mask).any() else tiny
        interferer_db = max(
            interferer_db,
            10.0 * np.log10(max(peak_out, tiny) / max(peak_in, tiny)),
        )
    # Global skirt post-pass: the per-chunk bound compares against that
    # chunk's strongest channel, but a chunk catching only a burst's
    # ramp transient sees little of the carrier and lets the ramp's
    # wideband splatter register the OTHER channel as active (with the
    # 75%-overlap chunking this happens reliably).  A channel whose
    # best showing across the whole capture is below -40 dBc of the
    # strongest channel's best showing AND that was never the dominant
    # in-band channel of any chunk is skirt/splatter, not a
    # transmission.  The dominance exemption keeps a genuine far vessel
    # (own TDMA slot, arbitrarily weak globally) active, so an extreme
    # near-far capture still takes the ci8 fallback it needs (reviewer
    # r5: the unconditioned post-pass silently bypassed it).
    strongest_peak = max(ch_peak)
    for ci, p in enumerate(ch_peak):
        if (
            ch_active[ci]
            and not ch_dominant[ci]
            and p < SKIRT_BOUND * strongest_peak
        ):
            ch_active[ci] = False
            ch_snr[ci] = -99.0
    act = [p for p, a in zip(ch_peak, ch_active) if a]
    near_far_db = (
        10.0 * np.log10(max(act) / max(min(act), tiny)) if len(act) >= 2 else 0.0
    )
    return {
        "near_far_db": float(near_far_db),
        "interferer_db": float(interferer_db),
        "channels_active": ch_active,
        "channel_snr_db": [float(s) for s in ch_snr],
    }


def select_wire_format(
    iq: np.ndarray,
    preferred: str = "cr1",
    rate: float = 2.4e6,
    offsets: tuple = (-25e3, +25e3),
    near_far_limit_db: float = 24.0,
    interferer_limit_db: float = 6.0,
    min_snr_db: float = 15.5,
) -> tuple[str, str]:
    """Auto-fallback for the 1-bit ingest formats: (format, reason).

    cr1/ci1 buy ingest bandwidth with a peak-referenced 1-bit encode
    whose measured envelopes are 28/26 dB near-far (tests/
    test_wideband.py) and "the AIS channels dominate the capture"
    (the sigma-delta scale is set by the total peak: a strong
    out-of-band interferer pushes the wanted channels toward the
    quantization floor).  When the capture's statistics exceed those
    envelopes — checked per buffer, WIRE.md for the measured bounds —
    fall back to the linear ci8 wire (full front-end dynamic range at
    4x the bytes) instead of silently losing weak packets.  The limits
    sit a few dB inside the tested bounds.

    `min_snr_db` is the AWGN-floor (sensitivity) gate, VERDICT r4
    item 3: cr1's packet success falls off below Eb/N0 ~18-20 dB while
    ci1 matches the float path to ~1 dB (WIRE.md sensitivity table —
    the one measured envelope the r4 guard did not check).  When the
    weakest ACTIVE channel's in-band SNR proxy (channel_snr_db, which
    tracks Eb/N0 - ~3.9 dB) is below this margin, a cr1 preference
    falls back to ci1: same 1-bit sigma-delta family at 2x the bytes,
    float-equivalent sensitivity.  The default 15.5 dB corresponds to
    Eb/N0 ~19.4 dB — right at cr1's measured >=95%-success floor
    (20 dB), so captures below the crossover ride ci1.  An idle
    channel (never active in any chunk) does not trip the gate.
    """
    if preferred not in ("cr1", "ci1", "cd1"):
        return preferred, "linear format: no envelope to check"
    env = wire_format_envelope(iq, rate=rate, offsets=offsets)
    if env["interferer_db"] > interferer_limit_db:
        return (
            "ci8",
            f"out-of-band interferer {env['interferer_db']:.1f} dB above "
            f"the AIS channels (> {interferer_limit_db:.0f} dB limit)",
        )
    if env["near_far_db"] > near_far_limit_db:
        return (
            "ci8",
            f"near-far imbalance {env['near_far_db']:.1f} dB "
            f"(> {near_far_limit_db:.0f} dB limit)",
        )
    if preferred == "cr1":
        act_snr = [
            s
            for s, a in zip(env["channel_snr_db"], env["channels_active"])
            if a
        ]
        if act_snr and min(act_snr) < min_snr_db:
            return (
                "ci1",
                f"in-band SNR {min(act_snr):.1f} dB below the cr1 "
                f"sensitivity margin ({min_snr_db:.1f} dB ~ Eb/N0 "
                f"{min_snr_db + 3.9:.0f} dB, cr1's measured AWGN floor "
                f"- WIRE.md): ci1 holds float-path sensitivity",
            )
    return preferred, "within envelope"


def iq_from_bytes_cu8(raw_u8: jax.Array) -> jax.Array:
    """(2n,) uint8 offset-binary (rtl_sdr) interleaved IQ -> (n,) complex64."""
    v = (raw_u8.astype(jnp.float32) - 127.5) * (1.0 / 127.5)
    v = v.reshape(v.shape[-1] // 2, 2)
    return jax.lax.complex(v[:, 0], v[:, 1])


def host_bytes(
    iq: np.ndarray,
    fmt: str,
    *,
    ci2_dither: float = 0.2,
    headroom: float | None = None,
) -> np.ndarray:
    """Encode complex64 IQ into the uint8 wire view for tests/benches.

    `ci2_dither`: Gaussian dither amplitude for the 2-bit encode, as a
    fraction of the buffer's per-component RMS (0 disables).  A coarse
    quantizer driven by a near-noiseless multi-carrier scene folds
    phase-dependent intermod spurs into the channel band and can lose a
    marginal burst; ~0.1-0.3 RMS of dither whitens the spurs and
    restores full-load content parity to 1.0 (real front ends get this
    dither for free from thermal noise).  Deterministic (fixed seed).

    `headroom`: override the sigma-delta loop headroom for ci1/cr1
    (defaults CI1_HEADROOM / CR1_HEADROOM; tools/wire_sweep.py measures
    the margin the defaults sit in — WIRE.md).
    """
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
        # AGC'd Lloyd-Max encode (see iq_from_bytes_ci2): normalize the
        # buffer to unit per-component RMS, then threshold at
        # {-t, 0, +t}.  Full-load parity with this quantizer is 1.0
        # where the old fixed-full-scale uniform levels lost packets.
        rms = float(np.sqrt(0.5 * np.mean(np.abs(iq) ** 2))) or 1.0
        t = CI2_THRESH * rms
        re, im = iq.real, iq.imag
        if ci2_dither:
            rng = np.random.default_rng(0xC12)
            amp = ci2_dither * rms
            re = re + rng.normal(size=iq.size) * amp
            im = im + rng.normal(size=iq.size) * amp
        enc = lambda x: (  # noqa: E731 — code = #thresholds below x
            (x > -t).astype(np.int32) + (x > 0) + (x > t)
        )
        i, q = enc(re), enc(im)
        b = (i[0::2] << 6) | (q[0::2] << 4) | (i[1::2] << 2) | q[1::2]
        return b.astype(np.uint8)
    if fmt == "ci1":
        if iq.size % 4:
            raise ValueError("ci1 packs 4 samples/byte: need size % 4 == 0")
        # 99.9th percentile rejects isolated glitches, but when bursts
        # occupy <0.1% of the buffer it collapses to the noise floor and
        # would overload the sigma-delta loop for the burst's whole
        # duration — the true-max floor (inactive for dense near-Gaussian buffers, whose 99.9th pct exceeds half the max) keeps scale*|x| <= ~1.4 always
        # (brief clipping the clamped integrator absorbs).
        comps = np.abs(np.concatenate([iq.real, iq.imag]))
        peak = float(max(np.percentile(comps, 99.9), 0.5 * comps.max())) or 1.0
        scale = (CI1_HEADROOM if headroom is None else headroom) / peak
        try:
            from ais_tpu import native

            if native.available():
                return native.sigma_delta_ci1(
                    np.ascontiguousarray(iq, np.complex64), scale
                )
        except Exception:  # noqa: BLE001 — numpy twin below
            pass
        return _sigma_delta_ci1_numpy(np.asarray(iq, np.complex64), scale)
    if fmt == "cd1":
        return cd1_bytes_from_ci1(host_bytes(iq, "ci1"), iq.size)
    if fmt == "cr1":
        # Same peak-referenced scaling discipline as ci1 (see above);
        # the IF real stream has the same component peaks.
        comps = np.abs(np.concatenate([iq.real, iq.imag]))
        peak = float(max(np.percentile(comps, 99.9), 0.5 * comps.max())) or 1.0
        scale = (CR1_HEADROOM if headroom is None else headroom) / peak
        try:
            from ais_tpu import native

            if native.available():
                return native.sigma_delta_cr1(
                    np.ascontiguousarray(iq, np.complex64), scale, CR1_A2
                )
        except Exception:  # noqa: BLE001 — numpy twin below
            pass
        return _sigma_delta_cr1_numpy(
            np.asarray(iq, np.complex64), scale, CR1_A2
        )
    if fmt == "cu8":
        i = np.round(np.clip(iq.real, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        q = np.round(np.clip(iq.imag, -1, 1) * 127.5 + 127.5).astype(np.uint8)
        out = np.empty(iq.size * 2, dtype=np.uint8)
        out[0::2] = i
        out[1::2] = q
        return out
    raise ValueError(f"unsupported format {fmt!r}")
