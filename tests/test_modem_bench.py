"""Loopback modem workbench CLI (cli/modem_bench.py): the standalone
equivalent of the reference's modem experimentation flowgraphs
(python/ais_demod_grc.py, python/ais_demod2.grc)."""

import json

from ais_tpu.cli.modem_bench import main


def test_clean_loopback_decodes(capsys):
    rc = main(
        [
            "--demod",
            "feedforward",
            "--snr-db",
            "20",
            "--trials",
            "4",
            "--json",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    (point,) = out["points"]
    assert point["demod"] == "feedforward"
    assert point["success"] == 1.0


def test_impaired_loopback_mlse(capsys):
    rc = main(
        [
            "--demod",
            "mlse",
            "--snr-db",
            "12",
            "--trials",
            "3",
            "--cfo-hz",
            "250",
            "--ppm",
            "25",
            "--json",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["points"][0]["success"] == 1.0
