"""Whole-receiver checkpoint/resume (SURVEY.md §5.4's design promise).

The reference keeps DSP state in C++ block members and cannot
checkpoint (restart = resync at the next preamble); here the entire
stream state is explicit (sample buffer, absolute position, dedup
memory, resampler carry), so a snapshot is a small picklable dict and a
killed receiver resumes EXACTLY: the split run must produce the
identical packet set as the unbroken run, including packets straddling
the snapshot point.
"""

import pickle

import numpy as np
import pytest

from ais_tpu.ops.convert import host_bytes
from ais_tpu.pipeline.radio import AisRadio
from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps
from ais_tpu.tx import aivdm_payload_to_bytes
from ais_tpu.tx.scenario import Scenario, ScenarioPacket

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"


def _key(packets):
    return sorted((p.payload, p.abs_sample, p.designator) for p in packets)


def _wideband_capture(cfg, n):
    """Packets across both channels, several per step, one near the
    planned snapshot cut so the straddle case is exercised."""
    raw = aivdm_payload_to_bytes(PAYLOAD)
    rng = np.random.default_rng(21)
    packets = []
    for ci, off in enumerate(cfg.offsets_hz):
        for k in range(5):
            p = bytearray(raw)
            p[1] = (13 * k + ci) % 256
            start = 60_000 + k * (n - 160_000) // 5 + ci * 45_000
            packets.append(
                ScenarioPacket(
                    payload=bytes(p),
                    start_sample=start,
                    offset_hz=float(off),
                    phase=float(rng.uniform(0, 2 * np.pi)),
                    extra_freq_hz=float(rng.uniform(-150, 150)),
                )
            )
    return (
        Scenario(
            sample_rate=cfg.input_rate, n_samples=n, packets=packets, noise=0.004
        ).build()
        * 0.7
    ).astype(np.complex64), packets


def _small_cfg():
    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len  # 2 demod blocks per device call
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    return cfg, n_in


def test_wideband_kill_resume_exact():
    cfg, n_in = _small_cfg()
    rx_full = WidebandReceiver(cfg, n_in=n_in)
    n = rx_full.step_raw * 4
    iq, tx = _wideband_capture(cfg, n)
    want = _key(rx_full.decode(iq) + rx_full.flush())
    assert len(want) >= len(tx) - 1  # the scene itself decodes

    # Run half the stream, snapshot mid-buffer (a non-step-aligned cut),
    # "kill" the receiver, resume a FRESH one from the pickled state.
    cut = rx_full.step_raw + rx_full.n_in // 3
    rx_a = WidebandReceiver(cfg, n_in=n_in)
    got = rx_a.decode(iq[:cut])
    blob = pickle.dumps(rx_a.get_state())
    del rx_a

    rx_b = WidebandReceiver(cfg, n_in=n_in)
    rx_b.set_state(pickle.loads(blob))
    got += rx_b.decode(iq[cut:]) + rx_b.flush()
    assert _key(got) == want


def test_radio_wideband_state_roundtrip():
    radio = AisRadio(sample_rate=2.4e6, fused_blocks=2)
    cfg = radio.wideband.cfg
    n = radio.wideband.step_raw * 2
    iq, _tx = _wideband_capture(cfg, n)
    cut = n // 2 + 12_345
    r1 = AisRadio(sample_rate=2.4e6, fused_blocks=2)
    got = r1.process(iq[:cut])
    state = pickle.loads(pickle.dumps(r1.get_state()))
    r2 = AisRadio(sample_rate=2.4e6, fused_blocks=2)
    r2.set_state(state)
    got += r2.process(iq[cut:]) + r2.flush()
    want = radio.process(iq) + radio.flush()
    assert _key(got) == _key(want)


def test_radio_channel_path_state_roundtrip():
    """The reference-default 250 ksps fractional-rate path: resampler
    carry + baseband tail must survive the snapshot."""
    import jax.numpy as jnp

    from ais_tpu.ops.resample import pfb_arb_resample
    from ais_tpu.tx import make_packet_iq

    raw = aivdm_payload_to_bytes(PAYLOAD)
    burst48 = make_packet_iq(raw, samples_per_symbol=5)
    sig48 = np.zeros(60_000, dtype=np.complex64)
    sig48[24_000 : 24_000 + burst48.size] = burst48
    sig250 = np.asarray(pfb_arb_resample(jnp.asarray(sig48), 250.0 / 48.0))
    t = np.arange(sig250.size) / 250e3
    rng = np.random.default_rng(7)
    iq = (
        rng.normal(size=sig250.size) + 1j * rng.normal(size=sig250.size)
    ).astype(np.complex64) * 0.02
    iq += (sig250 * np.exp(-2j * np.pi * 25e3 * t)).astype(np.complex64)

    want = AisRadio(sample_rate=250e3).process(iq)
    assert len(want) == 1

    cut = 24_000 * 5 + 600  # mid-packet: the straddle case
    r1 = AisRadio(sample_rate=250e3)
    got = r1.process(iq[:cut])
    state = pickle.loads(pickle.dumps(r1.get_state()))
    r2 = AisRadio(sample_rate=250e3)
    r2.set_state(state)
    got += r2.process(iq[cut:])

    # Control: the same split WITHOUT a checkpoint (one live receiver).
    # Resume must be EXACT vs this — same packets, same positions.
    rc = AisRadio(sample_rate=250e3)
    control = rc.process(iq[:cut]) + rc.process(iq[cut:])
    assert _key(got) == _key(control)

    # And the content matches the unbroken run (position within the
    # chunked-streaming jitter of the AFC/resampler lattice, a few
    # samples — a property of chunking itself, checkpoint or not).
    assert [p.payload for p in got] == [p.payload for p in want]
    assert abs(got[0].abs_sample - want[0].abs_sample) <= 8


def test_state_topology_mismatch_raises():
    r_chan = AisRadio(sample_rate=250e3)
    r_wide = AisRadio(sample_rate=2.4e6, fused_blocks=2)
    with pytest.raises(ValueError, match="wideband"):
        r_chan.set_state(r_wide.get_state())


def test_set_rate_rebuilds_topology():
    """The reference's set_rate is broken (python/radio.py:131-139,
    undefined rx_path1); here it works: retune 2.4 Msps -> 250 ksps and
    decode on the new grid."""
    radio = AisRadio(sample_rate=2.4e6, fused_blocks=2)
    assert radio.uses_fused_wideband
    radio.set_rate(250e3)
    assert radio.get_rate() == 250e3
    assert not radio.uses_fused_wideband and len(radio.rx_paths) == 2
