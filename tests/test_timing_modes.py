"""Both timing-recovery implementations must decode at the pipeline level."""

import dataclasses

import numpy as np
import pytest

from ais_tpu.core.params import DemodConfig
from ais_tpu.pipeline import BasebandReceiver
from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"
SENTENCE = "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"


@pytest.mark.parametrize("mode", ["feedforward", "pll"])
def test_pipeline_decodes_with_mode(mode):
    rng = np.random.default_rng(7)
    pkt = make_packet_iq(aivdm_payload_to_bytes(PAYLOAD), samples_per_symbol=5)
    iq = (rng.normal(size=48000) + 1j * rng.normal(size=48000)).astype(
        np.complex64
    ) * 0.02
    rot = np.exp(2j * np.pi * 800.0 * np.arange(pkt.size) / 48000.0)
    iq[7000 : 7000 + pkt.size] += (pkt * rot).astype(np.complex64)
    rx = BasebandReceiver(demod=DemodConfig(timing_mode=mode))
    assert rx.sentences(iq) == [SENTENCE]


def test_unknown_mode_raises():
    with pytest.raises(ValueError, match="timing_mode"):
        BasebandReceiver(demod=DemodConfig(timing_mode="bogus"))
