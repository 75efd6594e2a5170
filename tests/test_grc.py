"""GRC flowgraph import (ais_tpu/io/grc.py).

The committed fixture is SYNTHESIZED XML in the GRC 3.7 schema (the
reference's own ais.grc is upstream content; the importer is validated
against it manually — see the module docstring's faithful-import
semantics).  The import must (a) map every chain block's parameters
onto the matching config fields, (b) scale burst geometry when the
deframer bound exceeds the window capacity (reference
python/ais.grc:1229 runs hdlc_deframer_bp(11, 1000)), (c) surface
unmapped blocks as warnings, and (d) produce a config that actually
decodes.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ais_tpu.io.grc import flowgraph_to_config, load_flowgraph  # noqa: E402


def _block(key, **params):
    ps = "".join(
        f"<param><key>{k}</key><value>{v}</value></param>"
        for k, v in params.items()
    )
    return f"<block><key>{key}</key>{ps}</block>"


def _connection(src, dst):
    return (
        f"<connection><source_block_id>{src}</source_block_id>"
        f"<sink_block_id>{dst}</sink_block_id>"
        f"<source_key>0</source_key><sink_key>0</sink_key></connection>"
    )


def _write_flowgraph(path, deframer_max=64, rate="48e3*5", extra=""):
    xml = (
        "<?xml version='1.0' encoding='ASCII'?><flow_graph>"
        + _block("options", id="top_block")
        + _block("variable", id="sps", value="5")
        + _block("variable", id="samp_rate", value=rate)
        + _block("blocks_file_source", id="src", file="cap.iq",
                 type="complex", repeat="False")
        + _block("satisfi_square_and_fft_sync", id="afc",
                 rate="samp_rate", fftlen="512")
        + _block("analog_feedforward_agc_cc", id="agc",
                 num_samples="256", reference="1.5")
        + _block("digital_msk_correlate_cc", id="corr",
                 symbols="[1,1,-1,-1]*7", bt="0.35", sps="sps")
        + _block("digital_msk_timing_recovery_cc", id="clk",
                 gain="0.05", sps="sps", limit="0.015", osps="1")
        + _block("analog_quadrature_demod_cf", id="qd", gain="1")
        + _block("digital_binary_slicer_fb", id="slice")
        + _block("digital_diff_decoder_bb", id="diff", modulus="2")
        + _block("ais_invert", id="inv")
        + _block("digital_hdlc_deframer_bp", id="hdlc",
                 min="11", max=str(deframer_max))
        + _block("ais_pdu_to_nmea", id="nmea")
        + _block("qtgui_time_sink_x", id="scope")  # cosmetic, ignored
        + extra
        + _connection("src", "afc")
        + _connection("afc", "agc")
        + _connection("agc", "corr")
        + _connection("corr", "clk")
        + _connection("clk", "qd")
        + _connection("qd", "slice")
        + _connection("slice", "diff")
        + _connection("diff", "inv")
        + _connection("inv", "hdlc")
        + _connection("hdlc", "nmea")
        + "</flow_graph>"
    )
    path.write_text(xml)
    return str(path)


class TestImport:
    def test_chain_params_map(self, tmp_path):
        cfg, info = flowgraph_to_config(
            _write_flowgraph(tmp_path / "a.grc")
        )
        d = cfg.demod
        assert d.timing_mode == "pll"
        assert d.fftlen == 512
        assert d.agc_window == 256 and d.agc_reference == 1.5
        assert d.gmsk_bt == 0.35
        assert d.clockrec_gain == 0.05
        assert d.omega_relative_limit == 0.015
        assert d.resolved_corr_threshold == 0.9 and d.corr_cfar_k is None
        assert d.afc_gate_ratio is None  # reference AFC is ungated
        assert cfg.deframer.max_length_bytes == 64
        assert cfg.channelizer.input_rate == 240e3
        assert info["target_sps"] == 5
        assert info["source"]["kind"] == "file"
        assert not [w for w in info["warnings"] if "unmapped" in w]

    def test_long_frame_bound_scales_burst_geometry(self, tmp_path):
        cfg, info = flowgraph_to_config(
            _write_flowgraph(tmp_path / "b.grc", deframer_max=1000)
        )
        assert cfg.deframer.max_length_bytes == 1000
        assert cfg.demod.max_frame_bytes >= 1000
        assert any("scaled burst_len" in w for w in info["warnings"])

    def test_unmapped_block_warns(self, tmp_path):
        cfg, info = flowgraph_to_config(
            _write_flowgraph(
                tmp_path / "c.grc",
                extra=_block("digital_costas_loop_cc", id="pll", w="0.1"),
            )
        )
        assert any("digital_costas_loop_cc" in w for w in info["warnings"])

    def test_non_ais_flowgraph_rejected(self, tmp_path):
        p = tmp_path / "d.grc"
        p.write_text(
            "<?xml version='1.0' encoding='ASCII'?><flow_graph>"
            + _block("options", id="top")
            + _block("blocks_throttle", id="t")
            + "</flow_graph>"
        )
        with pytest.raises(ValueError, match="no gr-ais chain blocks"):
            flowgraph_to_config(str(p))

    def test_load_flowgraph_variables(self, tmp_path):
        fg = load_flowgraph(_write_flowgraph(tmp_path / "e.grc"))
        assert fg["variables"]["sps"] == 5
        assert fg["variables"]["samp_rate"] == 240e3
        assert ("src", "afc") in fg["connections"]


class TestImportedConfigDecodes:
    def test_end_to_end(self, tmp_path):
        """The imported config is live, not just parsed: a packet at the
        flowgraph's rate decodes through ChannelReceiver."""
        from oracle_modulator import make_oracle_packet

        from ais_tpu.pipeline.api import ChannelReceiver
        from ais_tpu.tx import aivdm_payload_to_bytes

        cfg, info = flowgraph_to_config(
            _write_flowgraph(tmp_path / "f.grc", rate="48e3*5")
        )
        rx = ChannelReceiver(cfg, target_sps=info["target_sps"])
        raw = aivdm_payload_to_bytes("14eG;o@034o8sd<L9i:a;WF>062D")
        # The capture is at the flowgraph's RAW rate (240 ksps = 25
        # samples/symbol); the imported channelizer decimates to 5 sps.
        pkt = make_oracle_packet(raw, sps=25)
        rng = np.random.default_rng(1)
        iq = (rng.normal(size=120_000) + 1j * rng.normal(size=120_000)).astype(
            np.complex64
        ) * 0.02
        iq[30_000 : 30_000 + pkt.size] += pkt.astype(np.complex64)
        got = rx.process(iq)
        assert [p.nmea for p in got] == [
            "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"
        ]
