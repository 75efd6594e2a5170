"""AIS field parser (ais_tpu/decode/fields.py).

The parser is validated two ways: against the publicly documented
decode of the canonical test sentence, and by round-tripping through an
independent bit-packer written here from the ITU-R M.1371 field tables
(MSB-first packing, two's complement, 6-bit ASCII) that shares no code
with the module under test.
"""

import numpy as np
import pytest

from ais_tpu.decode.fields import format_fields, parse_fields
from ais_tpu.tx import aivdm_payload_to_bytes

CANONICAL = "14eG;o@034o8sd<L9i:a;WF>062D"


class BitPacker:
    """Independent MSB-first field packer (test-side encoder)."""

    def __init__(self):
        self.bits = []

    def u(self, value: int, n: int):
        assert 0 <= value < (1 << n)
        self.bits += [(value >> i) & 1 for i in range(n - 1, -1, -1)]
        return self

    def s(self, value: int, n: int):
        return self.u(value & ((1 << n) - 1), n)

    def text(self, s: str, n_chars: int):
        for i in range(n_chars):
            c = s[i] if i < len(s) else "@"  # '@' = unused
            v = ord(c)
            self.u(v - 64 if v >= 64 else v, 6)
        return self

    def payload(self) -> bytes:
        b = self.bits + [0] * (-len(self.bits) % 8)
        return np.packbits(np.array(b, np.uint8)).tobytes()


def test_canonical_sentence_fields():
    """The published decode of the golden payload: a Class A position
    report from MMSI 316001245 off Vancouver at 19.6 kn."""
    f = parse_fields(aivdm_payload_to_bytes(CANONICAL))
    assert f["msg_type"] == 1
    assert f["repeat"] == 0
    assert f["mmsi"] == 316001245
    assert f["nav_status"] == 0
    assert f["rot_deg_min"] == 0.0
    assert f["sog_kn"] == 19.6
    assert abs(f["lon_deg"] - (-123.87775)) < 1e-9
    assert abs(f["lat_deg"] - 49.200283) < 1e-6
    assert f["cog_deg"] == 235.0
    assert f["heading_deg"] == 235
    assert f["utc_second"] == 7
    s = format_fields(f)
    assert "mmsi=316001245" in s and "sog=19.6kn" in s


def test_type1_roundtrip():
    p = (
        BitPacker()
        .u(1, 6).u(0, 2).u(367123456, 30)          # type/repeat/mmsi
        .u(5, 4)                                    # nav_status: moored
        .s(19, 8)                                   # ROT raw 19 -> (19/4.733)^2
        .u(123, 10).u(1, 1)                         # sog 12.3 kn, accuracy
        .s(int(-73.5 * 600000), 28)                 # lon
        .s(int(40.7 * 600000), 27)                  # lat
        .u(895, 12).u(89, 9).u(33, 6)               # cog 89.5, hdg, second
        .u(0, 2).u(0, 3).u(1, 1).u(0, 19)           # maneuver/spare/raim/radio
        .payload()
    )
    f = parse_fields(p)
    assert f["msg_type"] == 1 and f["mmsi"] == 367123456
    assert f["nav_status"] == 5
    assert f["rot_deg_min"] == round((19 / 4.733) ** 2, 1)
    assert f["sog_kn"] == 12.3 and f["position_accuracy"] == 1
    assert abs(f["lon_deg"] + 73.5) < 1e-5
    assert abs(f["lat_deg"] - 40.7) < 1e-5
    assert f["cog_deg"] == 89.5 and f["heading_deg"] == 89
    assert f["utc_second"] == 33


def test_type1_not_available_sentinels():
    p = (
        BitPacker()
        .u(3, 6).u(0, 2).u(1, 30).u(15, 4)
        .s(-128, 8)                                 # ROT n/a
        .u(1023, 10).u(0, 1)                        # SOG n/a
        .s(0x6791AC0, 28).s(0x3412140, 27)          # lon/lat n/a
        .u(3600, 12).u(511, 9).u(60, 6)             # COG/HDG n/a
        .u(0, 21)
        .payload()
    )
    f = parse_fields(p)
    assert f["msg_type"] == 3
    assert f["rot_deg_min"] is None and f["sog_kn"] is None
    assert f["lon_deg"] is None and f["lat_deg"] is None
    assert f["cog_deg"] is None and f["heading_deg"] is None
    assert "pos=" not in format_fields(f)


def test_type4_base_station():
    p = (
        BitPacker()
        .u(4, 6).u(0, 2).u(2655619, 30)
        .u(2026, 14).u(8, 4).u(18, 5).u(14, 5).u(30, 6).u(59, 6)
        .u(1, 1)
        .s(int(11.9 * 600000), 28).s(int(57.7 * 600000), 27)
        .u(7, 4).u(0, 1).u(0, 1).u(0, 9).u(0, 19)
        .payload()
    )
    f = parse_fields(p)
    assert f["msg_type"] == 4 and f["mmsi"] == 2655619
    assert (f["year"], f["month"], f["day"]) == (2026, 8, 18)
    assert (f["hour"], f["minute"], f["second"]) == (14, 30, 59)
    assert abs(f["lon_deg"] - 11.9) < 1e-5 and abs(f["lat_deg"] - 57.7) < 1e-5
    assert f["epfd"] == 7


def test_type5_static_voyage():
    p = (
        BitPacker()
        .u(5, 6).u(0, 2).u(249110000, 30).u(1, 2)
        .u(9176187, 30)
        .text("9HA2936", 7)
        .text("EVER GIVEN", 20)
        .u(70, 8)                                   # cargo ship
        .u(200, 9).u(200, 9).u(30, 6).u(29, 6)      # dimensions
        .u(1, 4)
        .u(3, 4).u(23, 5).u(11, 5).u(45, 6)         # ETA
        .u(159, 8)                                  # draught 15.9 m
        .text("ROTTERDAM", 20)
        .u(0, 1).u(0, 1)
        .payload()
    )
    f = parse_fields(p)
    assert f["msg_type"] == 5 and f["mmsi"] == 249110000
    assert f["imo"] == 9176187
    assert f["callsign"] == "9HA2936"
    assert f["shipname"] == "EVER GIVEN"
    assert f["ship_type"] == 70
    assert (f["to_bow_m"], f["to_stern_m"]) == (200, 200)
    assert (f["eta_month"], f["eta_day"], f["eta_hour"], f["eta_minute"]) == (
        3, 23, 11, 45,
    )
    assert f["draught_m"] == 15.9
    assert f["destination"] == "ROTTERDAM"
    s = format_fields(f)
    assert "name='EVER GIVEN'" in s and "dest='ROTTERDAM'" in s


def test_type18_class_b():
    p = (
        BitPacker()
        .u(18, 6).u(0, 2).u(338123456, 30).u(0, 8)
        .u(71, 10).u(1, 1)
        .s(int(-122.4 * 600000), 28).s(int(37.8 * 600000), 27)
        .u(1234, 12).u(123, 9).u(17, 6)
        .u(0, 2).u(0, 27)
        .payload()
    )
    f = parse_fields(p)
    assert f["msg_type"] == 18 and f["mmsi"] == 338123456
    assert f["sog_kn"] == 7.1
    assert abs(f["lon_deg"] + 122.4) < 1e-5 and abs(f["lat_deg"] - 37.8) < 1e-5
    assert f["cog_deg"] == 123.4 and f["heading_deg"] == 123
    assert f["utc_second"] == 17


def test_type24_parts():
    a = BitPacker().u(24, 6).u(0, 2).u(111, 30).u(0, 2)
    a.text("PART A BOAT", 20).u(0, 8)
    fa = parse_fields(a.payload())
    assert fa["part"] == 0 and fa["shipname"] == "PART A BOAT"

    b = BitPacker().u(24, 6).u(0, 2).u(111, 30).u(1, 2)
    b.u(36, 8).text("ABC", 3).u(0, 24).text("CALL123", 7)
    b.u(9, 9).u(3, 9).u(2, 6).u(2, 6).u(0, 6)
    fb = parse_fields(b.payload())
    assert fb["part"] == 1 and fb["ship_type"] == 36
    assert fb["vendor_id"] == "ABC" and fb["callsign"] == "CALL123"
    assert (fb["to_bow_m"], fb["to_port_m"]) == (9, 2)


def test_unknown_and_truncated_degrade_to_header():
    f = parse_fields(BitPacker().u(9, 6).u(1, 2).u(42, 30).u(0, 130).payload())
    assert f["msg_type"] == 9 and f["mmsi"] == 42 and f["repeat"] == 1
    assert "sog_kn" not in f
    short = parse_fields(bytes([0x04]))  # 0b000001.. -> type 1, truncated
    assert short["msg_type"] == 1 and short["n_bits"] == 8
    assert "sog_kn" not in short  # 144-bit minimum not met


def test_decoded_packet_fields_property():
    """End-to-end: a decoded packet exposes .fields past the armoring
    boundary (the reference stops at the sentence)."""
    from ais_tpu.pipeline import BasebandReceiver
    from ais_tpu.tx import make_packet_iq

    raw = aivdm_payload_to_bytes(CANONICAL)
    iq = make_packet_iq(raw, samples_per_symbol=5)
    buf = np.zeros(48000, np.complex64)
    buf[9000 : 9000 + iq.size] = iq
    rng = np.random.default_rng(0)
    buf += 0.01 * (
        rng.normal(size=buf.size) + 1j * rng.normal(size=buf.size)
    ).astype(np.complex64)
    (pkt,) = BasebandReceiver().process(buf)
    assert pkt.fields["mmsi"] == 316001245
    assert pkt.fields["sog_kn"] == 19.6
