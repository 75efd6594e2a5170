"""Valid-lane d2h compaction (pipeline/wideband.py:pack_wire_compact).

The compacted fetch must be a pure transport optimization: identical
packet sets to the dense `pack_wire_flat` path, and a directory bound
smaller than the step's valid-lane count must degrade to host-side
block re-demod (overflow recovery), never loss.
"""

import numpy as np

from ais_tpu.ops.convert import host_bytes
from ais_tpu.pipeline.wideband import WidebandConfig, WidebandReceiver, num_taps
from ais_tpu.tx import aivdm_payload_to_bytes
from ais_tpu.tx.scenario import Scenario, ScenarioPacket

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"


def _scene(cfg, n_samples, n_packets=6):
    raw = aivdm_payload_to_bytes(PAYLOAD)
    rng = np.random.default_rng(5)
    packets = []
    for k in range(n_packets):
        p = bytearray(raw)
        p[1] = (11 * k) % 256
        packets.append(
            ScenarioPacket(
                payload=bytes(p),
                start_sample=35_000 + k * (n_samples - 140_000) // n_packets,
                offset_hz=float(cfg.offsets_hz[k % 2]),
                phase=float(rng.uniform(0, 2 * np.pi)),
                extra_freq_hz=float(rng.uniform(-150, 150)),
            )
        )
    iq = Scenario(
        sample_rate=cfg.input_rate,
        n_samples=n_samples,
        packets=packets,
        noise=0.004,
    ).build()
    return host_bytes((iq * 0.7).astype(np.complex64), "ci8"), packets


def _geometry():
    cfg = WidebandConfig()
    n48 = cfg.block_len + cfg.core_len * 2  # 3 blocks
    n_in = (n48 - 1) * cfg.decimation + num_taps(cfg)
    return cfg, n_in


def _decode(cfg, n_in, wire):
    rx = WidebandReceiver(cfg, n_in=n_in)
    pkts = rx.decode_wire(wire[: rx.n_in * 2], "ci8")
    return sorted((p.payload, p.abs_sample, p.designator) for p in pkts)


def test_compact_matches_dense():
    cfg, n_in = _geometry()
    wire, tx = _scene(cfg, n_in + 8 * cfg.decimation)
    dense = _decode(cfg, n_in, wire)
    assert len(dense) >= len(tx) - 1  # the scene itself decodes
    compact = _decode(cfg._replace(compact_lanes=64), n_in, wire)
    assert compact == dense


def test_compact_meta_roundtrip():
    """The scattered-back records carry the same meta (positions, freq,
    rssi to f32 exactness) as the dense path, not just the same payload
    bytes."""
    cfg, n_in = _geometry()
    wire, _tx = _scene(cfg, n_in + 8 * cfg.decimation)

    rx_d = WidebandReceiver(cfg, n_in=n_in)
    rx_c = WidebandReceiver(cfg._replace(compact_lanes=48), n_in=n_in)
    pd = rx_d.decode_wire(wire[: rx_d.n_in * 2], "ci8")
    pc = rx_c.decode_wire(wire[: rx_c.n_in * 2], "ci8")
    key = lambda p: (p.abs_sample, p.designator)  # noqa: E731
    for a, b in zip(sorted(pd, key=key), sorted(pc, key=key)):
        assert a.payload == b.payload
        assert a.abs_sample == b.abs_sample
        assert a.designator == b.designator
        assert np.isclose(a.freq_est_hz, b.freq_est_hz, atol=1e-4)
        assert np.isclose(a.rssi, b.rssi, rtol=1e-5)
        assert np.isclose(a.corr_mag, b.corr_mag, rtol=1e-5)


def test_compact_directory_overflow_recovers():
    """More valid lanes than the directory bound: the host re-demods the
    affected blocks (overflow recovery) and still returns every packet."""
    cfg, n_in = _geometry()
    wire, tx = _scene(cfg, n_in + 8 * cfg.decimation, n_packets=8)
    dense = _decode(cfg, n_in, wire)
    assert len(dense) >= len(tx) - 1
    # Bound of 2 lanes: far below the ~8 valid lanes in the step.
    tight = _decode(cfg._replace(compact_lanes=2), n_in, wire)
    assert tight == dense
