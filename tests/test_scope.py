"""`ais_scope` diagnostics CLI (cli/ais_scope.py) — the GRC GUI-sink
replacement must be *proven*: the PNG renders and the panel data is
correct (PSD peak at the channel offset, correlator peak at the burst,
AFC estimate near the injected CFO)."""

import numpy as np

from ais_tpu.cli.ais_scope import compute_panels, main
from ais_tpu.core.params import DemodConfig
from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"
CFO_HZ = 120.0
BURST_AT = 30_000  # channel-rate sample index of the packet


def _baseband_capture(n=120_000):
    """Channel-rate (48 ksps) capture: one packet at BURST_AT with a
    small carrier offset, noise elsewhere."""
    rng = np.random.default_rng(5)
    iq = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64
    ) * 0.01
    pkt = make_packet_iq(aivdm_payload_to_bytes(PAYLOAD), samples_per_symbol=5)
    n_pkt = np.arange(pkt.size)
    cfo = np.exp(2j * np.pi * CFO_HZ * n_pkt / 48_000.0).astype(np.complex64)
    iq[BURST_AT : BURST_AT + pkt.size] += (0.7 * pkt * cfo).astype(np.complex64)
    return iq


def test_panel_data_correct():
    iq = _baseband_capture()
    cfg = DemodConfig()
    p = compute_panels(iq, iq, cfg, threshold=0.9, rate=48_000.0)

    # Correlator peak marks the burst (preamble start, within the ramp).
    assert abs(p["peak"] - BURST_AT) < 64
    assert p["corr2"][p["peak"]] > p["thr"]

    # PSD peak sits near the burst carrier (CFO off DC, well under 1 kHz).
    peak_khz = p["psd_f_khz"][int(np.argmax(p["psd_db"]))]
    assert abs(peak_khz * 1e3 - CFO_HZ) < 1000.0

    # The AFC chunk containing the burst estimates the injected CFO.
    chunk = BURST_AT // cfg.fftlen
    assert abs(float(p["freq_est_hz"][chunk]) - CFO_HZ) < 25.0


def test_cli_renders_png(tmp_path):
    iq = _baseband_capture()
    cap = tmp_path / "cap.bin"
    iq.astype(np.complex64).tofile(cap)
    out = tmp_path / "scope.png"
    rc = main(["-s", str(cap), "-S", "-o", str(out)])
    assert rc == 0
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 50_000  # six drawn panels, not an empty canvas
