"""Pallas fused mixer+polyphase channelizer vs the XLA ground truth.

Runs the kernel in interpret mode on the CPU backend (conftest forces
CPU); the real-TPU correctness + timing probe is
tools/tpu_pallas_chan_probe.py.  Ground truth is the einsum polyphase
formulation (`ops/fir.py:_fir_polyphase_einsum`) behind
`freq_xlating_polyphase`, itself cross-checked against
`conv_general_dilated` in test_ops.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ais_tpu.ops.cplx import to_planes
from ais_tpu.ops.fir import (
    _mixer_carrier,
    freq_xlating_polyphase,
    mixer_phase,
    polyphase_spectra,
)
from ais_tpu.ops.firdes import low_pass
from ais_tpu.ops.pallas_fir import (
    PallasChannelizer,
    carrier_period_samples,
    pallas_channelizer_supported,
)


def _xla_reference(iq, taps, decim, offsets, rate, phase0s):
    n = iq.size
    n_out = n // decim - (-(-taps.size // decim)) + 1
    carriers = np.concatenate([_mixer_carrier(o, rate, n) for o in offsets])
    hf = polyphase_spectra(taps, decim, n_out)
    return np.asarray(
        freq_xlating_polyphase(
            jnp.asarray(to_planes(iq)),
            jnp.asarray(to_planes(carriers)),
            jnp.asarray(phase0s),
            taps,
            decim,
            jnp.asarray(to_planes(hf)),
        )
    )


class TestGeometry:
    def test_ais_wideband_period(self):
        assert carrier_period_samples(25e3, 2.4e6) == 96
        assert carrier_period_samples(-25e3, 2.4e6) == 96
        assert carrier_period_samples(0.0, 2.4e6) == 1

    def test_irrational_offset_unsupported(self):
        # An offset with no small rational relation to fs has no
        # periodic carrier tile; the wrapper must fall back.
        assert not pallas_channelizer_supported(
            2891, 50, (25e3 * np.sqrt(2),), 2.4e6
        )

    def test_ais_wideband_supported(self):
        taps = low_pass(1.0, 2.4e6, 11e3, 2e3)
        assert pallas_channelizer_supported(taps.size, 50, (-25e3, 25e3), 2.4e6)


class TestKernelParity:
    @pytest.mark.parametrize("start", [0, 12345])
    def test_wideband_config_matches_xla(self, start):
        # The production geometry: D=50, ~2.9k taps, +-25 kHz @ 2.4 Msps.
        rate, decim, offsets = 2.4e6, 50, (-25e3, 25e3)
        taps = low_pass(1.0, rate, 11e3, 2e3)
        rng = np.random.default_rng(7)
        n_in = 80_000  # ~2 output tiles of 768
        iq = (
            (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3
        ).astype(np.complex64)
        phase0s = np.stack([mixer_phase(o, rate, start) for o in offsets])

        ref = _xla_reference(iq, taps, decim, offsets, rate, phase0s)
        chan = PallasChannelizer(taps, decim, offsets, rate, n_in,
                                 interpret=True)
        got = np.asarray(chan(jnp.asarray(to_planes(iq)), jnp.asarray(phase0s)))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)

    def test_alternate_geometry(self):
        # Different decim/taps/offset exercise the generic tile search
        # (P smaller than a lane group, zero offset -> period 1).
        rate, decim, offsets = 240e3, 5, (0.0, 60e3)
        taps = low_pass(1.0, rate, 20e3, 8e3)
        rng = np.random.default_rng(3)
        n_in = 20_000
        iq = (
            (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3
        ).astype(np.complex64)
        phase0s = np.stack([mixer_phase(o, rate, 999) for o in offsets])
        ref = _xla_reference(iq, taps, decim, offsets, rate, phase0s)
        chan = PallasChannelizer(taps, decim, offsets, rate, n_in,
                                 interpret=True)
        got = np.asarray(chan(jnp.asarray(to_planes(iq)), jnp.asarray(phase0s)))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)

    def test_composes_under_jit(self):
        # The fused wire program traces the channelizer inside one jit.
        rate, decim, offsets = 2.4e6, 50, (-25e3, 25e3)
        taps = low_pass(1.0, rate, 11e3, 2e3)
        n_in = 40_000
        rng = np.random.default_rng(11)
        iq = (
            (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3
        ).astype(np.complex64)
        phase0s = np.stack([mixer_phase(o, rate, 0) for o in offsets])
        chan = PallasChannelizer(taps, decim, offsets, rate, n_in,
                                 interpret=True)

        @jax.jit
        def fused(planes, ph):
            return jnp.sum(jnp.abs(chan(planes, ph)) ** 2)

        v = float(fused(jnp.asarray(to_planes(iq)), jnp.asarray(phase0s)))
        ref = _xla_reference(iq, taps, decim, offsets, rate, phase0s)
        np.testing.assert_allclose(v, np.sum(np.abs(ref) ** 2), rtol=1e-4)


class TestWireKernelParity:
    """Fused bytes->channels kernel vs XLA convert + channelize."""

    @pytest.mark.parametrize("fmt", ["ci1", "ci2", "ci4", "cr1"])
    def test_wire_matches_xla_convert_plus_chan(self, fmt):
        from ais_tpu.ops.convert import (
            host_bytes,
            iq_from_bytes_ci1,
            iq_from_bytes_ci2,
            iq_from_bytes_ci4,
            iq_from_bytes_cr1,
        )
        from ais_tpu.ops.pallas_fir import (
            pallas_wire_channelizer,
            wire_channelizer_buffers,
            wire_channelizer_supported,
        )

        rate, decim, offsets = 2.4e6, 50, (-25e3, 25e3)
        taps = low_pass(1.0, rate, 11e3, 2e3)
        assert wire_channelizer_supported(fmt, taps.size, decim, offsets, rate)
        rng = np.random.default_rng(17)
        n_in = 80_000
        iq = (
            (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3
        ).astype(np.complex64)
        raw = host_bytes(iq, fmt)
        phase0s = np.stack([mixer_phase(o, rate, 777) for o in offsets])

        conv = {
            "ci1": iq_from_bytes_ci1,
            "ci2": iq_from_bytes_ci2,
            "ci4": iq_from_bytes_ci4,
            "cr1": lambda raw: iq_from_bytes_cr1(raw, n_in),
        }[fmt]
        # Ground truth: XLA decode then XLA channelize on the SAME
        # quantized samples.
        dec = np.asarray(conv(jnp.asarray(raw)))
        ref = _xla_reference(dec.astype(np.complex64), taps, decim, offsets,
                             rate, phase0s)

        car, h = wire_channelizer_buffers(fmt, taps, decim, offsets, rate)
        got = np.asarray(
            pallas_wire_channelizer(
                jnp.asarray(raw), jnp.asarray(phase0s), jnp.asarray(car),
                jnp.asarray(h), fmt=fmt, ntaps=taps.size, decim=decim,
                offsets=offsets, rate=rate, n_in=n_in, interpret=True,
            )
        )
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)

    @pytest.mark.parametrize("m_mult", [2, 4])
    def test_cr1_m_mult_matches_base_tile(self, m_mult):
        """Fatter output tiles (m_mult) amortize Mosaic's per-tile
        overhead without touching the math: every invariant (carrier
        periodicity over the tile advance, mR % 128, mR % bhR) survives
        an integer multiple.  Same dots, same collapse — but the dot's
        M dimension changes with the tile, and the CPU interpret path
        (Eigen) picks a shape-dependent accumulation strategy, so only
        rounding-level differences are allowed (observed ~1e-7 abs, ~2.5e-6 of full scale;
        on Mosaic the systolic K-order is shape-independent)."""
        from ais_tpu.ops.convert import host_bytes
        from ais_tpu.ops.pallas_fir import (
            pallas_wire_channelizer,
            wire_channelizer_buffers,
        )

        rate, decim, offsets = 2.4e6, 50, (-25e3, 25e3)
        taps = low_pass(1.0, rate, 11e3, 2e3)
        rng = np.random.default_rng(23)
        n_in = 400_000  # >1 tile at m_mult=1 (m=1536, n_out=7943)
        iq = (
            (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)) * 0.3
        ).astype(np.complex64)
        raw = jnp.asarray(host_bytes(iq, "cr1"))
        ph = jnp.asarray(
            np.stack([mixer_phase(o, rate, 777) for o in offsets])
        )

        def run(k):
            car, g = wire_channelizer_buffers(
                "cr1", taps, decim, offsets, rate, m_mult=k
            )
            return np.asarray(
                pallas_wire_channelizer(
                    raw, ph, jnp.asarray(car), jnp.asarray(g), fmt="cr1",
                    ntaps=taps.size, decim=decim, offsets=offsets,
                    rate=rate, n_in=n_in, interpret=True, m_mult=k,
                )
            )

        base, grown = run(1), run(m_mult)
        assert grown.shape == base.shape
        np.testing.assert_allclose(
            grown, base, atol=1e-5 * np.abs(base).max(), rtol=0
        )

    def test_m_mult_rejected_off_cr1(self):
        from ais_tpu.ops.pallas_fir import wire_channelizer_buffers

        taps = low_pass(1.0, 2.4e6, 11e3, 2e3)
        with pytest.raises(ValueError, match="m_mult"):
            wire_channelizer_buffers(
                "ci1", taps, 50, (-25e3, 25e3), 2.4e6, m_mult=2
            )
