"""MXU direct-form matched filter vs the FFT path and a numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ais_tpu.ops.pallas_corr import (
    corr_tap_groups,
    matched_filter_mxu,
    pallas_matched_filter,
)
from ais_tpu.sync.corr import matched_filter
from ais_tpu.tx.gmsk import preamble_waveform


def _numpy_corr(x, p):
    pc = np.conj(np.asarray(p, np.complex128))
    xx = np.asarray(x, np.complex128)
    n, L = xx.shape[-1], pc.size
    out = np.empty(xx.shape[:-1] + (n - L + 1,), np.complex128)
    for idx in np.ndindex(*xx.shape[:-1]):
        out[idx] = np.correlate(xx[idx], np.conj(pc), mode="valid")
    return out


@pytest.fixture(scope="module")
def preamble():
    return preamble_waveform(5, 0.4)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 4096)) + 1j * rng.normal(size=(3, 4096))).astype(
        np.complex64
    ) * 0.1
    x[0, 500 : 500 + 140] += preamble_waveform(5, 0.4).astype(np.complex64)
    x[2, 3900 : 3900 + 140] += preamble_waveform(5, 0.4).astype(np.complex64)[
        : 4096 - 3900
    ]
    return x


class TestTapGroups:
    def test_group_count_and_content(self, preamble):
        a = corr_tap_groups(preamble)
        assert a.shape == (3, 2, 128, 128)
        pc = np.conj(preamble)
        # Spot-check the defining identity Ac[s, r] = pc[s + c*128 - r].
        assert a[0, 0, 10, 3] == pytest.approx(pc[7].real)
        assert a[1, 1, 10, 100] == pytest.approx(pc[38].imag)
        assert a[2, 0, 5, 127] == pytest.approx(pc[134].real)
        assert a[0, 0, 3, 10] == 0.0  # k < 0
        assert a[2, 0, 50, 3] == 0.0  # k >= L


class TestXlaPath:
    def test_matches_numpy(self, signal, preamble):
        got = np.asarray(matched_filter_mxu(jnp.asarray(signal), preamble))
        want = _numpy_corr(signal, preamble)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_matches_fft_path(self, signal, preamble):
        got = np.asarray(matched_filter_mxu(jnp.asarray(signal), preamble))
        fft = np.asarray(matched_filter(jnp.asarray(signal), preamble))
        np.testing.assert_allclose(got, fft, atol=5e-4)

    def test_1d_input(self, signal, preamble):
        got = np.asarray(matched_filter_mxu(jnp.asarray(signal[0]), preamble))
        want = _numpy_corr(signal[0], preamble)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_non_multiple_of_128_length(self, preamble):
        rng = np.random.default_rng(3)
        x = (rng.normal(size=(2, 1000)) + 1j * rng.normal(size=(2, 1000))).astype(
            np.complex64
        )
        got = np.asarray(matched_filter_mxu(jnp.asarray(x), preamble))
        want = _numpy_corr(x, preamble)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestPallasPath:
    def test_matches_numpy(self, signal, preamble):
        got = np.asarray(pallas_matched_filter(jnp.asarray(signal), preamble))
        want = _numpy_corr(signal, preamble)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_fused_mag2(self, signal, preamble):
        corr, mag2 = pallas_matched_filter(
            jnp.asarray(signal), preamble, with_mag2=True
        )
        corr, mag2 = np.asarray(corr), np.asarray(mag2)
        np.testing.assert_allclose(
            mag2, corr.real**2 + corr.imag**2, rtol=1e-6, atol=1e-6
        )
        want = _numpy_corr(signal, preamble)
        np.testing.assert_allclose(corr, want, atol=2e-4)

    def test_inside_jit(self, signal, preamble):
        fn = jax.jit(lambda x: pallas_matched_filter(x, preamble))
        got = np.asarray(fn(jnp.asarray(signal)))
        want = _numpy_corr(signal, preamble)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_pipeline_corr_path_parity(self):
        """End-to-end: every matched-filter formulation decodes the same
        packet through the full receiver (corr_path plumbing in
        pipeline/receiver.py:make_burst_demod)."""
        from ais_tpu.core.params import DemodConfig
        from ais_tpu.pipeline import BasebandReceiver
        from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

        want = "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"
        iq0 = make_packet_iq(
            aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D"), 5
        )
        rng = np.random.default_rng(1)
        cap = (
            (rng.normal(size=20000) + 1j * rng.normal(size=20000)) * 0.02
        ).astype(np.complex64)
        cap[5000 : 5000 + iq0.size] += iq0.astype(np.complex64)
        for path in ("fft", "mxu", "pallas"):
            rx = BasebandReceiver(demod=DemodConfig(corr_path=path))
            assert rx.sentences(cap.copy()) == [want], path

    def test_peak_detection_equivalence(self, signal, preamble):
        """The quantity burst detection consumes — peak position and
        value of |corr|^2 — is identical between the paths."""
        fft = np.asarray(matched_filter(jnp.asarray(signal), preamble))
        mxu = np.asarray(pallas_matched_filter(jnp.asarray(signal), preamble))
        m_f = np.abs(fft[0]) ** 2
        m_x = np.abs(mxu[0]) ** 2
        assert np.argmax(m_f) == np.argmax(m_x) == 500
        assert np.max(m_x) == pytest.approx(np.max(m_f), rel=1e-4)
