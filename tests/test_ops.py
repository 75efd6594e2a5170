"""DSP op units against numpy references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ais_tpu.ops.agc import feedforward_agc
from ais_tpu.ops.demod import quadrature_demod, slice_diff_invert
from ais_tpu.ops.fir import fir_filter, freq_xlating_fir_decimate, mixer_phase
from ais_tpu.ops.firdes import low_pass, low_pass_2
from ais_tpu.ops.freq import freqest, gate_and_hold, square_and_fft_sync
from ais_tpu.ops.interp import DELAY, NTAPS, interp_taps, interpolate


class TestFir:
    def test_matches_numpy_valid_conv(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64)
        taps = rng.normal(size=31).astype(np.float32)
        out = np.asarray(fir_filter(jnp.asarray(x), taps))
        ref = np.array(
            [np.dot(taps, x[i : i + 31]) for i in range(300 - 31 + 1)]
        )
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-4)

    def test_decimation(self):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(np.complex64)
        taps = rng.normal(size=31).astype(np.float32)
        full = np.asarray(fir_filter(jnp.asarray(x), taps, 1))
        dec = np.asarray(fir_filter(jnp.asarray(x), taps, 5))
        np.testing.assert_allclose(dec, full[::5], rtol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(2)
        x = (rng.normal(size=(3, 200)) + 1j * rng.normal(size=(3, 200))).astype(
            np.complex64
        )
        taps = rng.normal(size=17).astype(np.float32)
        out = np.asarray(fir_filter(jnp.asarray(x), taps))
        for b in range(3):
            row = np.asarray(fir_filter(jnp.asarray(x[b]), taps))
            np.testing.assert_allclose(out[b], row, rtol=1e-5)

    def test_freq_xlating_extracts_offset_channel(self):
        # A tone at +25 kHz mixed down by +25 kHz and low-passed must
        # come out near-DC with unity amplitude; a tone at -25 kHz must be
        # rejected (reference channelizer role, python/radio.py:51-54).
        fs = 250e3
        n = 8192
        t = np.arange(n) / fs
        taps = low_pass(1.0, fs, 11e3, 4e3)
        for sign, expect in ((+1, 1.0), (-1, 0.0)):
            x = np.exp(2j * np.pi * sign * 25e3 * t).astype(np.complex64)
            y = np.asarray(
                freq_xlating_fir_decimate(jnp.asarray(x), taps, 25e3, fs, 5)
            )
            level = np.abs(y[50:-50]).mean()
            assert abs(level - expect) < 0.02, (sign, level)

    def test_mixer_phase_continuity(self):
        # Processing one long block must equal two half blocks chained
        # with mixer_phase start offsets.
        fs = 250e3
        n = 4096
        rng = np.random.default_rng(3)
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        taps = low_pass(1.0, fs, 11e3, 4e3)
        ntaps = taps.size
        whole = np.asarray(
            freq_xlating_fir_decimate(jnp.asarray(x), taps, 25e3, fs, 1)
        )
        half = n // 2
        a = np.asarray(freq_xlating_fir_decimate(jnp.asarray(x[:half]), taps, 25e3, fs, 1))
        b = np.asarray(
            freq_xlating_fir_decimate(
                jnp.asarray(x[half - ntaps + 1 :]),
                taps,
                25e3,
                fs,
                1,
                phase0=mixer_phase(25e3, fs, half - ntaps + 1),
            )
        )
        np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=2e-3)


class TestFirdes2:
    """Attenuation-parameterized design — upstream firdes.low_pass_2,
    used by the reference's resampler prototype (python/ais.grc:1523)."""

    @pytest.mark.parametrize("atten", [60.0, 96.0])
    def test_stopband_attenuation_met(self, atten):
        fs, cutoff, trans = 48000.0, 11000.0, 1000.0
        taps = low_pass_2(1.0, fs, cutoff, trans, atten)
        H = np.abs(np.fft.rfft(taps, 1 << 16))
        w = np.fft.rfftfreq(1 << 16, 1.0 / fs)
        stop = w > cutoff + trans
        worst_db = 20 * np.log10(H[stop].max() / H[0])
        assert worst_db < -atten

    def test_unity_dc_gain_and_passband(self):
        fs = 48000.0
        taps = low_pass_2(1.0, fs, 11000.0, 1000.0, 96.0)
        np.testing.assert_allclose(taps.sum(), 1.0, atol=1e-6)
        H = np.abs(np.fft.rfft(taps, 1 << 16))
        w = np.fft.rfftfreq(1 << 16, 1.0 / fs)
        passband = H[w < 10000.0]
        np.testing.assert_allclose(passband, 1.0, atol=0.01)

    def test_higher_attenuation_means_more_taps(self):
        t60 = low_pass_2(1.0, 48e3, 11e3, 1e3, 60.0)
        t96 = low_pass_2(1.0, 48e3, 11e3, 1e3, 96.0)
        assert t96.size > t60.size


class TestAgc:
    def test_normalizes_lookahead_peak(self):
        x = np.zeros(2000, dtype=np.complex64)
        x[1000:1500] = 4.0  # burst of amplitude 4
        y = np.asarray(feedforward_agc(jnp.asarray(x), window=512, reference=2.0))
        # Inside the burst: scaled to reference.
        np.testing.assert_allclose(np.abs(y[1000:1400]), 2.0, rtol=1e-5)
        # The 512 samples before the burst already see it in lookahead:
        # gain there is 2/4, and the zeros stay zero.
        assert np.abs(y[488:1000]).max() == 0.0

    def test_batched_independent_rows(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(size=(2, 800)) + 1j * rng.normal(size=(2, 800))).astype(
            np.complex64
        )
        x[1] *= 100.0
        y = np.asarray(feedforward_agc(jnp.asarray(x), 256, 2.0))
        np.testing.assert_allclose(
            np.abs(y[0]).max(), np.abs(y[1]).max(), rtol=1e-4
        )


class TestQuadDemod:
    def test_constant_rotation_rate(self):
        f = 1000.0
        fs = 48000.0
        n = 200
        x = np.exp(2j * np.pi * f * np.arange(n) / fs).astype(np.complex64)
        y = np.asarray(quadrature_demod(jnp.asarray(x), gain=1.0))
        np.testing.assert_allclose(y[1:], 2 * np.pi * f / fs, rtol=1e-4)
        assert y[0] == 0.0

    def test_slice_diff_invert_nrzi(self):
        # NRZI levels for data 0,1,0,1... recover the data.
        from ais_tpu.tx import nrzi_encode

        rng = np.random.default_rng(1)
        data = rng.integers(0, 2, 100).astype(np.uint8)
        levels = nrzi_encode(data, initial_level=1)
        soft = jnp.asarray(levels.astype(np.float32) * 2 - 1)
        out = np.asarray(slice_diff_invert(soft))
        np.testing.assert_array_equal(out[1:], data[1:])


class TestFreqest:
    def _gmsk(self, offset_hz, n=4096, fs=48000.0):
        from ais_tpu.tx.gmsk import modulate_bits

        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, n // 5 + 10)
        x = np.asarray(modulate_bits(bits, 5))[:n]
        return (x * np.exp(2j * np.pi * offset_hz * np.arange(n) / fs)).astype(
            np.complex64
        )

    @pytest.mark.parametrize("offset", [0.0, 500.0, -1200.0, 3000.0])
    def test_estimates_offset(self, offset):
        fs, fftlen = 48000.0, 1024
        x = self._gmsk(offset)
        chunks = (x * x).reshape(-1, fftlen)
        est, conf = freqest(jnp.asarray(chunks), fs, 9600.0)
        binsize = fs / fftlen
        assert np.all(np.abs(np.asarray(est) - offset) <= binsize), np.asarray(est)
        assert np.all(np.asarray(conf) > 6.0)

    def test_noise_has_low_confidence(self):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
        chunks = (x * x).reshape(-1, 1024)
        _, conf = freqest(jnp.asarray(chunks), 48000.0, 9600.0)
        assert np.all(np.asarray(conf) < 6.0), np.asarray(conf)

    def test_gate_and_hold(self):
        est = jnp.asarray([100.0, 200.0, 300.0, 400.0])
        conf = jnp.asarray([10.0, 1.0, 10.0, 1.0])
        out = np.asarray(gate_and_hold(est, conf, 6.0))
        np.testing.assert_allclose(out, [100.0, 100.0, 300.0, 300.0])

    def test_derotation_removes_offset(self):
        fs, fftlen = 48000.0, 1024
        x = self._gmsk(2000.0)
        y, est = square_and_fft_sync(jnp.asarray(x), fs, 9600.0, fftlen)
        # After correction the squared-signal tone pair sits near DC.
        chunks = (y * y).reshape(-1, fftlen)
        est2, _ = freqest(chunks, fs, 9600.0)
        assert np.all(np.abs(np.asarray(est2)) <= fs / fftlen), np.asarray(est2)


class TestInterp:
    def test_bank_shape_and_dc(self):
        bank = interp_taps()
        assert bank.shape == (129, NTAPS)
        np.testing.assert_allclose(bank.sum(axis=1), 1.0, atol=1e-6)

    def test_integer_delay_phases(self):
        # mu=0 row should peak at tap DELAY; mu=1 row at DELAY+1.
        bank = interp_taps()
        assert np.argmax(bank[0]) == DELAY
        assert np.argmax(bank[-1]) == DELAY + 1

    @pytest.mark.parametrize("mu", [0.0, 0.25, 0.5, 0.75, 1.0])
    def test_fractional_delay_on_bandlimited_signal(self, mu):
        # 5x-oversampled complex tone: interpolation error must be tiny.
        fs = 5.0
        n = 64
        t = np.arange(n) / fs
        x = np.exp(2j * np.pi * 0.35 * t).astype(np.complex64)  # 0.35 Hz, fs 5
        got = complex(interpolate(jnp.asarray(x), jnp.int32(20), jnp.float32(mu)))
        want = np.exp(2j * np.pi * 0.35 * (20 + DELAY + mu) / fs)
        assert abs(got - want) < 5e-3


class TestDeviceConvert:
    def test_ci16_roundtrip(self):
        from ais_tpu.ops.convert import host_bytes, iq_from_bytes_ci16

        rng = np.random.default_rng(0)
        iq = ((rng.normal(size=500) + 1j * rng.normal(size=500)) * 0.25).astype(
            np.complex64
        )
        iq = np.clip(iq.real, -0.99, 0.99) + 1j * np.clip(iq.imag, -0.99, 0.99)
        iq = iq.astype(np.complex64)
        raw = host_bytes(iq, "ci16")
        got = np.asarray(iq_from_bytes_ci16(jnp.asarray(raw)))
        np.testing.assert_allclose(got, iq, atol=1.5 / 32768)

    def test_ci8_and_cu8_roundtrip(self):
        from ais_tpu.ops.convert import (
            host_bytes,
            iq_from_bytes_ci8,
            iq_from_bytes_cu8,
        )

        rng = np.random.default_rng(1)
        iq = ((rng.normal(size=300) + 1j * rng.normal(size=300)) * 0.3).astype(
            np.complex64
        )
        got8 = np.asarray(iq_from_bytes_ci8(jnp.asarray(host_bytes(iq, "ci8"))))
        np.testing.assert_allclose(got8, iq, atol=1.5 / 128)
        gotu = np.asarray(iq_from_bytes_cu8(jnp.asarray(host_bytes(iq, "cu8"))))
        np.testing.assert_allclose(gotu, iq, atol=1.5 / 127.5)

    def test_decode_through_ci16_ingest(self):
        from ais_tpu.ops.convert import host_bytes, iq_from_bytes_ci16
        from ais_tpu.pipeline import BasebandReceiver
        from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

        raw = aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D")
        pkt = make_packet_iq(raw, 5)
        rng = np.random.default_rng(2)
        iq = (rng.normal(size=48000) + 1j * rng.normal(size=48000)).astype(
            np.complex64
        ) * 0.02
        iq[9000 : 9000 + pkt.size] += 0.5 * pkt
        wire = host_bytes(iq, "ci16")
        back = np.asarray(iq_from_bytes_ci16(jnp.asarray(wire)))
        assert BasebandReceiver().sentences(back.astype(np.complex64)) == [
            "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"
        ]
