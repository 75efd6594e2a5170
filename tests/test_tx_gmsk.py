"""GMSK modulator and FIR design units."""

import numpy as np

from ais_tpu.ops.firdes import gaussian, gmsk_phase_taps, low_pass, num_taps_low_pass
from ais_tpu.tx import modulate_bits, modulate_symbols, preamble_waveform


class TestFirdes:
    def test_low_pass_dc_gain(self):
        taps = low_pass(1.0, 250e3, 11e3, 1e3)
        assert abs(taps.sum() - 1.0) < 1e-6
        assert taps.size % 2 == 1

    def test_low_pass_stopband(self):
        fs = 250e3
        taps = low_pass(1.0, fs, 11e3, 1e3).astype(np.float64)
        w = np.linspace(0, np.pi, 4096)
        freqs = w * fs / (2 * np.pi)
        h = np.abs(np.exp(-1j * np.outer(w, np.arange(taps.size))) @ taps)
        # Passband flat to within 1 dB, stopband below -40 dB.
        assert h[freqs < 9e3].min() > 10 ** (-1 / 20)
        assert h[freqs > 13e3].max() < 10 ** (-40 / 20)

    def test_ntaps_heuristic(self):
        # 53 dB Hamming rule: 53/(22 * 1k/250k) ~ 602 -> odd
        assert num_taps_low_pass(250e3, 1e3) == 603

    def test_gaussian_normalized(self):
        taps = gaussian(1.0, 5, 0.4, 20)
        assert abs(taps.sum() - 1.0) < 1e-6
        assert np.argmax(taps) in (9, 10)

    def test_phase_taps_area(self):
        sps = 5
        taps = gmsk_phase_taps(sps, 0.4)
        assert abs(taps.sum() - sps) < 1e-4


class TestGmskMod:
    def test_constant_envelope(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, 100)
        iq = modulate_bits(bits, 5)
        np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-6)

    def test_steady_state_phase_advance(self):
        # A long run of +1 symbols must advance phase by +pi/2 per symbol.
        sps = 5
        iq = modulate_symbols(np.ones(40), sps).astype(np.complex128)
        phase = np.unwrap(np.angle(iq))
        dphi = phase[30 * sps] - phase[20 * sps]
        np.testing.assert_allclose(dphi, 10 * np.pi / 2, rtol=1e-3)

    def test_preamble_waveform_length(self):
        wf = preamble_waveform(5)
        assert wf.shape == (140,)  # 28 NRZI bits * 5 sps
        assert wf.dtype == np.complex64

    def test_alternating_pattern_is_periodic(self):
        # The [1,1,0,0] pattern repeats every 4 symbols; after ramp-in the
        # waveform must be periodic with period 4*sps.
        sps = 5
        wf = modulate_bits(np.tile([1, 1, 0, 0], 10), sps).astype(np.complex128)
        mid = wf[12 * sps : 28 * sps]
        shifted = wf[16 * sps : 32 * sps]
        # Periodic up to a constant phase rotation (mean freq = 0 here).
        ratio = shifted / mid
        np.testing.assert_allclose(np.abs(ratio), 1.0, atol=1e-6)
        assert np.ptp(np.angle(ratio * np.exp(-1j * np.angle(ratio[0])))) < 1e-3
