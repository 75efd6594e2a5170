"""Fused wideband pipeline (2.4 Msps dual-channel) on the CPU backend."""

import numpy as np
import pytest

from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps
from ais_tpu.tx import aivdm_payload_to_bytes
from ais_tpu.tx.scenario import Scenario, ScenarioPacket

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"
SENTENCE_A = "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"
SENTENCE_B = "!AIVDM,1,1,,B,14eG;o@034o8sd<L9i:a;WF>062D,0*7E"


@pytest.fixture(scope="module")
def receiver():
    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len
    return WidebandReceiver(cfg, n_in=(n48 - 1) * cfg.decimation + num_taps(cfg))


def test_dual_channel_decode(receiver):
    raw = aivdm_payload_to_bytes(PAYLOAD)
    iq = Scenario(
        sample_rate=2.4e6,
        n_samples=receiver.n_in,
        noise=0.004,
        packets=[
            ScenarioPacket(raw, 200000, -25e3, phase=0.7),
            ScenarioPacket(raw, 700000, +25e3, amplitude=0.6, extra_freq_hz=140.0),
        ],
    ).build()
    pkts = receiver.decode(iq)
    assert [p.nmea for p in pkts] == [SENTENCE_A, SENTENCE_B]


def test_geometry_alignment(receiver):
    assert receiver.n_in % receiver.cfg.decimation == 0
    assert receiver.step_raw <= receiver.n_in


def test_empty_capture(receiver):
    rng = np.random.default_rng(9)
    iq = (
        rng.normal(size=receiver.n_in) + 1j * rng.normal(size=receiver.n_in)
    ).astype(np.complex64) * 0.05
    assert receiver.decode(iq) == []
