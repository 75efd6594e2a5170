"""Auto-fallback when a capture exceeds the 1-bit formats' envelope.

The 1-bit sigma-delta wires (cr1/ci1) have MEASURED envelopes — 28/26 dB
near-far, channels-dominate-the-capture (WIRE.md, tests/test_wideband.py)
— where the reference's float path has none.  `select_wire_format`
(ops/convert.py) checks a buffer's statistics against those envelopes
and falls back to the linear ci8 wire instead of silently losing weak
packets (VERDICT r3 task 3).
"""

import numpy as np
import pytest

from ais_tpu.ops.convert import host_bytes, select_wire_format
from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps
from ais_tpu.tx import aivdm_payload_to_bytes
from ais_tpu.tx.scenario import Scenario, ScenarioPacket

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"
SENTENCE_A = "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"
SENTENCE_B = "!AIVDM,1,1,,B,14eG;o@034o8sd<L9i:a;WF>062D,0*7E"


@pytest.fixture(scope="module")
def geometry():
    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len
    # Round to the receiver's wire alignment so host_bytes buffers match.
    rx = WidebandReceiver(cfg, n_in=(n48 - 1) * cfg.decimation + num_taps(cfg))
    return cfg, rx.n_in


def _dual_scene(n_in, weak_amplitude=0.6):
    raw = aivdm_payload_to_bytes(PAYLOAD)
    return Scenario(
        sample_rate=2.4e6,
        n_samples=n_in,
        noise=0.004,
        packets=[
            ScenarioPacket(raw, 300000, -25e3, amplitude=weak_amplitude,
                           phase=0.7),
            ScenarioPacket(raw, 280000, +25e3, amplitude=0.8,
                           extra_freq_hz=90.0),
        ],
    ).build()


class TestSelection:
    def test_normal_scene_keeps_preferred(self, geometry):
        cfg, n_in = geometry
        iq = _dual_scene(n_in)
        fmt, reason = select_wire_format(iq, "cr1")
        assert fmt == "cr1", reason
        assert select_wire_format(iq, "ci1")[0] == "ci1"

    def test_linear_format_passthrough(self, geometry):
        cfg, n_in = geometry
        iq = _dual_scene(n_in)
        assert select_wire_format(iq, "ci8")[0] == "ci8"

    def test_extreme_near_far_falls_back(self, geometry):
        cfg, n_in = geometry
        # 36 dB imbalance: past the cr1 (28 dB) and ci1 (26 dB) bounds.
        iq = _dual_scene(n_in, weak_amplitude=0.8 * 10 ** (-36 / 20))
        fmt, reason = select_wire_format(iq, "cr1")
        assert fmt == "ci8"
        assert "near-far" in reason

    def test_idle_channel_does_not_trip_near_far(self, geometry):
        cfg, n_in = geometry
        raw = aivdm_payload_to_bytes(PAYLOAD)
        iq = Scenario(
            sample_rate=2.4e6, n_samples=n_in, noise=0.004,
            packets=[ScenarioPacket(raw, 300000, +25e3, amplitude=0.8)],
        ).build()
        assert select_wire_format(iq, "cr1")[0] == "cr1"

    def test_strong_interferer_falls_back(self, geometry):
        cfg, n_in = geometry
        iq = _dual_scene(n_in)
        t = np.arange(n_in) / 2.4e6
        # A +500 kHz carrier 10x the AIS signals: it sets the 1-bit
        # peak-referenced scale and pushes the channels toward the
        # quantization floor.
        iq = (iq + 8.0 * np.exp(2j * np.pi * 500e3 * t)).astype(np.complex64)
        fmt, reason = select_wire_format(iq, "cr1")
        assert fmt == "ci8"
        assert "interferer" in reason


class TestFallbackActuallyHelps:
    def test_ci8_decodes_the_interferer_scene(self, geometry):
        """The guard is only worth having if its fallback WORKS: the
        interferer scene (which sets the 1-bit scale 20 dB above the
        signals) decodes fully through the linear ci8 wire — the
        channelizer stopband removes the carrier."""
        cfg, n_in = geometry
        iq = _dual_scene(n_in)
        t = np.arange(n_in) / 2.4e6
        iq = (iq + 8.0 * np.exp(2j * np.pi * 500e3 * t)).astype(np.complex64)
        # Normalize into the ci8 grid (a front end's AGC would).
        iq = (iq / (np.abs(iq).max() + 1e-9) * 0.9).astype(np.complex64)
        fmt, _ = select_wire_format(iq, "cr1")
        rx = WidebandReceiver(cfg, n_in=n_in)
        got = rx.decode_wire(host_bytes(iq, fmt), fmt)
        assert sorted(p.nmea for p in got) == [SENTENCE_A, SENTENCE_B]
