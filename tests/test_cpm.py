"""CPM decomposition utilities (fsm_utils capability)."""

import numpy as np

from ais_tpu.utils.cpm import (
    base2dec,
    dec2base,
    gmsk_frequency_pulse,
    make_cpm_signals,
)


class TestBaseConv:
    def test_roundtrip(self):
        for base in (2, 4, 8):
            for num in range(base**3):
                assert base2dec(dec2base(num, base, 3), base) == num


class TestPulse:
    def test_integral(self):
        p = gmsk_frequency_pulse(5, 0.4)
        assert abs(p.sum() - 0.5) < 1e-9


class TestDecomposition:
    def test_gmsk_structure(self):
        d = make_cpm_signals(M=2, h_num=1, h_den=2, sps=5)
        # h=1/2: 4 phase states x 2^(L-1) memory states
        assert d.n_states % 4 == 0
        assert d.signals.shape[1] == 2
        # Constant envelope waveforms.
        np.testing.assert_allclose(np.abs(d.signals), 1.0, atol=1e-12)

    def test_state_transitions_closed(self):
        d = make_cpm_signals()
        assert d.next_state.min() >= 0
        assert d.next_state.max() < d.n_states

    def test_trellis_walk_is_continuous_phase(self):
        # Walking the trellis and concatenating per-interval waveforms
        # must yield a continuous-phase, constant-envelope signal whose
        # total phase tracks pi*h*sum(a_k).
        sps = 5
        d = make_cpm_signals(sps=sps)
        rng = np.random.default_rng(0)
        syms = rng.integers(0, 2, 200)
        state = 0
        chunks = []
        for s in syms:
            chunks.append(d.signals[state, s])
            state = int(d.next_state[state, s])
        wf = np.concatenate(chunks)
        # Continuous phase: per-sample steps bounded by the peak
        # instantaneous frequency (~pi/2 per symbol, spread by the pulse).
        dphi = np.angle(wf[1:] * np.conj(wf[:-1]))
        assert np.abs(dphi).max() < (np.pi / 2) / sps * 1.5
        # Net phase equals pi*h*sum(a) for the symbols whose pulses have
        # fully played out (ignore the last L edge symbols).
        alph = 2 * syms.astype(float) - 1
        L = d.signals.shape[-1]  # not symbols; recompute below
        total = np.unwrap(np.angle(wf))[-1] - np.angle(wf[0])
        expected = np.pi * 0.5 * alph[:-5].sum()
        assert abs(total - expected) < np.pi * 0.5 * 6  # edge-symbol slack

    def test_basis_captures_energy(self):
        d = make_cpm_signals(basis_energy=0.999)
        assert d.energy_captured >= 0.999
        # Basis is orthonormal.
        g = d.basis @ d.basis.conj().T
        np.testing.assert_allclose(g, np.eye(g.shape[0]), atol=1e-9)
        # Reconstruction from coefficients is accurate.
        rec = d.coeffs.reshape(-1, d.coeffs.shape[-1]) @ d.basis
        err = np.abs(rec - d.signals.reshape(-1, d.signals.shape[-1])).max()
        assert err < 0.1
