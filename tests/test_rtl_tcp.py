"""rtl_tcp network SDR source: protocol + end-to-end decode tests.

The reference drives SDR hardware through osmosdr
(reference: python/radio.py:186-199); its most common remote deployment
is the librtlsdr `rtl_tcp` server.  These tests run a faithful fake
rtl_tcp server in-process (header + command channel + cu8 stream) and
verify both the wire protocol (tune/rate/gain/ppm commands, matching
the controls the reference sets at python/radio.py:188-199) and a full
dual-channel packet decode through `AisRadio`.
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np
import pytest

from ais_tpu.io.rtl_tcp import (
    CMD_SET_AGC_MODE,
    CMD_SET_FREQ,
    CMD_SET_FREQ_CORRECTION,
    CMD_SET_GAIN,
    CMD_SET_GAIN_MODE,
    CMD_SET_SAMPLE_RATE,
    RtlTcpSource,
    parse_rtl_tcp_addr,
)
from ais_tpu.io.sources import SampleSource, open_source
from ais_tpu.pipeline.radio import AisRadio
from ais_tpu.tx import aivdm_payload_to_bytes, make_packet_iq

PAYLOAD = "14eG;o@034o8sd<L9i:a;WF>062D"
SENTENCE = "!AIVDM,1,1,,A,14eG;o@034o8sd<L9i:a;WF>062D,0*7D"


class FakeRtlTcpServer:
    """Minimal rtl_tcp server: sends the dongle header, records every
    5-byte command, streams a fixed cu8 capture, then half-closes."""

    def __init__(self, iq_bytes: bytes, tuner_type=5, gain_count=29, magic=b"RTL0"):
        self.commands: list[tuple[int, int]] = []
        self._iq = iq_bytes
        self._header = struct.pack(">4sII", magic, tuner_type, gain_count)
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._reader: threading.Thread | None = None
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _read_cmds(self, conn: socket.socket) -> None:
        buf = b""
        while True:
            try:
                data = conn.recv(4096)
            except OSError:
                break
            if not data:
                break
            buf += data
            while len(buf) >= 5:
                op, arg = struct.unpack(">BI", buf[:5])
                self.commands.append((op, arg))
                buf = buf[5:]

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        self._srv.close()
        conn.sendall(self._header)
        self._reader = threading.Thread(
            target=self._read_cmds, args=(conn,), daemon=True
        )
        self._reader.start()
        view = memoryview(self._iq)
        try:
            for i in range(0, len(view), 65536):
                conn.sendall(view[i : i + 65536])
            conn.shutdown(socket.SHUT_WR)  # EOF to the client; commands stay open
        except OSError:
            pass
        self._reader.join(timeout=10)
        conn.close()

    def join(self) -> None:
        self._thread.join(timeout=10)

    def signed(self) -> list[tuple[int, int]]:
        return [
            (op, struct.unpack(">i", struct.pack(">I", arg))[0])
            for op, arg in self.commands
        ]


def _cu8(iq: np.ndarray) -> bytes:
    u = np.empty(iq.size * 2, np.uint8)
    u[0::2] = np.round(np.clip(iq.real, -1, 1) * 127.5 + 127.5).astype(np.uint8)
    u[1::2] = np.round(np.clip(iq.imag, -1, 1) * 127.5 + 127.5).astype(np.uint8)
    return u.tobytes()


def _dual_channel_scene(fs=240e3, n=240000) -> np.ndarray:
    rng = np.random.default_rng(11)
    iq = ((rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.005).astype(np.complex64)
    burst = make_packet_iq(aivdm_payload_to_bytes(PAYLOAD), samples_per_symbol=25)
    t = np.arange(burst.size) / fs
    iq[20000 : 20000 + burst.size] += (
        0.5 * burst * np.exp(-2j * np.pi * 25e3 * t)
    ).astype(np.complex64)
    iq[120000 : 120000 + burst.size] += (
        0.5 * burst * np.exp(+2j * np.pi * 25e3 * t)
    ).astype(np.complex64)
    return iq


class TestProtocol:
    def test_header_and_command_sequence(self):
        srv = FakeRtlTcpServer(_cu8(np.zeros(4096, np.complex64)))
        src = RtlTcpSource(
            host="127.0.0.1",
            port=srv.port,
            sample_rate=240e3,
            gain_db=32.8,
            ppm=-12,
        )
        got = list(src.chunks(1024))
        srv.join()
        assert sum(c.size for c in got) == 4096
        assert src.tuner_type == 5 and src.tuner_gain_count == 29
        assert srv.signed() == [
            (CMD_SET_SAMPLE_RATE, 240000),
            (CMD_SET_FREQ_CORRECTION, -12),
            (CMD_SET_FREQ, 162000000),
            (CMD_SET_GAIN_MODE, 1),
            (CMD_SET_GAIN, 328),
        ]

    def test_auto_gain_uses_agc(self):
        srv = FakeRtlTcpServer(_cu8(np.zeros(64, np.complex64)))
        src = RtlTcpSource(host="127.0.0.1", port=srv.port, gain_db=None)
        list(src.chunks(64))
        srv.join()
        assert (CMD_SET_GAIN_MODE, 0) in srv.commands
        assert (CMD_SET_AGC_MODE, 1) in srv.commands
        assert all(op != CMD_SET_GAIN for op, _ in srv.commands)
        # ppm == 0: no correction command sent (matches a fresh dongle).
        assert all(op != CMD_SET_FREQ_CORRECTION for op, _ in srv.commands)

    def test_bad_magic_rejected(self):
        srv = FakeRtlTcpServer(b"", magic=b"NOPE")
        src = RtlTcpSource(host="127.0.0.1", port=srv.port)
        with pytest.raises(RuntimeError, match="bad magic"):
            src.connect()

    def test_live_retune_mid_stream(self):
        srv = FakeRtlTcpServer(_cu8(np.zeros(8192, np.complex64)))
        src = RtlTcpSource(host="127.0.0.1", port=srv.port)
        it = src.chunks(1024)
        next(it)
        src.set_gain(21.0)
        src.set_freq(161.975e6)
        list(it)
        srv.join()
        assert (CMD_SET_GAIN, 210) in srv.commands
        assert (CMD_SET_FREQ, 161975000) in srv.commands

    def test_parse_addr_variants(self):
        assert parse_rtl_tcp_addr("rtl_tcp:9.9.9.9:1000") == ("9.9.9.9", 1000)
        assert parse_rtl_tcp_addr("rtl_tcp=host:22") == ("host", 22)
        assert parse_rtl_tcp_addr("rtl_tcp://h:5") == ("h", 5)
        assert parse_rtl_tcp_addr("rtl_tcp") == ("127.0.0.1", 1234)
        assert parse_rtl_tcp_addr("rtl_tcp:somehost") == ("somehost", 1234)


class TestOpenSource:
    def test_direct_rtl_tcp_spec(self):
        src = open_source("rtl_tcp:1.2.3.4:5678", 250e3, gain_db=40.2, ppm=3)
        assert isinstance(src, RtlTcpSource)
        assert (src.host, src.port) == ("1.2.3.4", 5678)
        assert src.gain_db == 40.2 and src.ppm == 3
        assert src.freq_hz == 162.0e6

    def test_osmocom_device_string(self):
        """The reference reaches rtl_tcp through osmosdr device args
        (`-s osmocom -D rtl_tcp=host:port`, python/radio.py:188)."""
        src = open_source(
            "osmocom", 250e3, device_args="buffers=4,rtl_tcp=9.9.9.9:1000"
        )
        assert isinstance(src, RtlTcpSource)
        assert (src.host, src.port) == ("9.9.9.9", 1000)

    def test_osmocom_without_device_args_raises(self):
        with pytest.raises(RuntimeError, match="rtl_tcp"):
            open_source("osmocom", 250e3)


class TestEndToEnd:
    def test_dual_channel_decode_over_rtl_tcp(self):
        """Full path: fake SDR server -> cu8 stream -> fused wideband
        receiver -> both channels' sentences."""
        iq = _dual_channel_scene()
        srv = FakeRtlTcpServer(_cu8(iq))
        src = RtlTcpSource(
            host="127.0.0.1", port=srv.port, sample_rate=240e3, gain_db=38.6
        )
        radio = AisRadio(sample_rate=240e3)
        assert radio.uses_fused_wideband
        packets = list(radio.run(src, chunk_len=65536))
        srv.join()
        assert (CMD_SET_GAIN, 386) in srv.commands
        assert [p.designator for p in packets] == ["A", "B"]
        assert packets[0].nmea == SENTENCE
        assert packets[1].nmea == SENTENCE.replace(",A,", ",B,").replace(
            "*7D", "*7E"
        )

    def test_radio_forwards_gain_to_live_source(self):
        class _Src(SampleSource):
            sample_rate = 240e3

            def __init__(self):
                self.gains = []

            def set_gain(self, g):
                self.gains.append(g)

            def chunks(self, chunk_len):
                yield np.zeros(0, np.complex64)

        src = _Src()
        radio = AisRadio(sample_rate=240e3)
        list(radio.run(src))
        radio.set_gain(30.5)
        assert src.gains == [30.5]
