"""Bit-domain units: CRC, stuffing, HDLC deframe, NMEA armoring, NRZI.

These pin the byte/bit-level semantics shared with the reference's
deframer + pdu_to_nmea path (reference: python/radio.py:64,
lib/pdu_to_nmea_impl.cc).
"""

import numpy as np
import pytest

from ais_tpu.decode import (
    check_frame,
    crc16_x25,
    deframe,
    fcs_bytes,
    find_flags,
    frame_to_nmea,
    nmea_checksum,
    payload_to_sixbit,
    sixbit_to_ascii,
    ascii_to_sixbit,
    unstuff,
)
from ais_tpu.tx import (
    aivdm_payload_to_bytes,
    frame_bits,
    nrzi_encode,
    stuff,
)
from ais_tpu.utils.bits import bytes_to_bits_lsb_first


class TestCrc:
    def test_known_vector(self):
        # Canonical CRC-16/X.25 check value.
        assert crc16_x25(b"123456789") == 0x906E

    def test_fcs_roundtrip(self):
        payload = bytes(range(32))
        assert check_frame(payload + fcs_bytes(payload))

    def test_corrupted_frame_rejected(self):
        payload = bytes(range(32))
        frame = bytearray(payload + fcs_bytes(payload))
        frame[5] ^= 0x10
        assert not check_frame(bytes(frame))


class TestStuffing:
    def test_stuff_inserts_after_five_ones(self):
        bits = np.array([1, 1, 1, 1, 1, 1, 1], dtype=np.uint8)
        out = stuff(bits)
        assert out.tolist() == [1, 1, 1, 1, 1, 0, 1, 1]

    def test_unstuff_inverts_stuff(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            bits = rng.integers(0, 2, size=rng.integers(1, 200)).astype(np.uint8)
            recovered = unstuff(stuff(bits))
            assert recovered is not None
            np.testing.assert_array_equal(recovered, bits)

    def test_unstuff_rejects_six_ones(self):
        assert unstuff(np.array([0, 1, 1, 1, 1, 1, 1, 0], dtype=np.uint8)) is None


class TestDeframe:
    def _wire(self, payload: bytes) -> np.ndarray:
        return frame_bits(payload, ramp_bits=0)[24:]  # strip training

    def test_roundtrip(self):
        payload = bytes(range(21))  # 168-bit AIS-sized payload
        frames = deframe(self._wire(payload))
        assert len(frames) == 1
        assert frames[0].payload == payload

    def test_finds_flags(self):
        wire = self._wire(bytes(range(21)))
        flags = find_flags(wire)
        assert 0 in flags and wire.size - 8 in flags

    def test_length_bounds(self):
        short = bytes(range(5))
        assert deframe(self._wire(short), min_len=11, max_len=64) == []
        assert len(deframe(self._wire(short), min_len=3, max_len=64)) == 1

    def test_bit_error_rejected(self):
        wire = self._wire(bytes(range(21)))
        wire[20] ^= 1
        assert deframe(wire) == []

    def test_multiple_frames_share_stream(self):
        p1, p2 = bytes(range(21)), bytes(range(100, 121))
        wire = np.concatenate([self._wire(p1), self._wire(p2)])
        frames = deframe(wire)
        assert [f.payload for f in frames] == [p1, p2]

    def test_noise_between_frames(self):
        rng = np.random.default_rng(1)
        noise = rng.integers(0, 2, size=300).astype(np.uint8)
        wire = np.concatenate([noise, self._wire(bytes(range(21))), noise])
        frames = deframe(wire)
        assert len(frames) == 1


class TestNmea:
    def test_sixbit_ascii_roundtrip(self):
        payload = "14eG;o@034o8sd<L9i:a;WF>062D"  # type-1 position report shape
        np.testing.assert_array_equal(
            ascii_to_sixbit(sixbit_to_ascii(ascii_to_sixbit(payload))),
            ascii_to_sixbit(payload),
        )
        assert sixbit_to_ascii(ascii_to_sixbit(payload)) == payload

    def test_payload_bytes_roundtrip(self):
        payload = "14eG;o@034o8sd<L9i:a;WF>062D"
        raw = aivdm_payload_to_bytes(payload)
        assert len(raw) == 21  # 168 bits
        symbols, npad = payload_to_sixbit(raw)
        assert npad == 0
        assert sixbit_to_ascii(symbols) == payload

    def test_armoring_offsets(self):
        # Symbols 0..39 -> '0'..'W'; 40..63 -> '`'..'w'
        assert sixbit_to_ascii(np.array([0], dtype=np.uint8)) == "0"
        assert sixbit_to_ascii(np.array([39], dtype=np.uint8)) == "W"
        assert sixbit_to_ascii(np.array([40], dtype=np.uint8)) == "`"
        assert sixbit_to_ascii(np.array([63], dtype=np.uint8)) == "w"

    def test_checksum_skips_bang(self):
        assert nmea_checksum("!AB") == nmea_checksum("AB") == (ord("A") ^ ord("B"))

    def test_single_sentence(self):
        payload = "14eG;o@034o8sd<L9i:a;WF>062D"
        raw = aivdm_payload_to_bytes(payload)
        sentence = frame_to_nmea(raw, "A")
        body, cs = sentence.rsplit("*", 1)
        assert body == f"!AIVDM,1,1,,A,{payload},0"
        assert int(cs, 16) == nmea_checksum(body)

    def test_fragmentation_at_56_chars(self):
        # 71-symbol payload (426 bits -> not octet aligned; use 72 symbols,
        # 432 bits = 54 bytes) must split into 56 + 16 characters.
        raw = bytes(range(54))
        sentence = frame_to_nmea(raw, "B")
        lines = sentence.split("\n")
        assert len(lines) == 2
        assert lines[0].startswith("!AIVDM,2,1,,B,")
        assert lines[1].startswith("!AIVDM,2,2,,B,")
        frag1 = lines[0].split(",")[5]
        frag2 = lines[1].split(",")[5]
        assert len(frag1) == 56 and len(frag2) == 16


class TestNrzi:
    def test_rx_inverse(self):
        # The receiver recovers bits as NOT(level[n] XOR level[n-1])
        # (reference: python/ais_demod.py:51-52, lib/invert_impl.cc:62-64).
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, size=500).astype(np.uint8)
        levels = nrzi_encode(bits, initial_level=1)
        prev = np.concatenate([[1], levels[:-1]])
        recovered = 1 - (levels ^ prev)
        np.testing.assert_array_equal(recovered, bits)

    def test_training_sequence_is_1100_pattern(self):
        # Alternating data bits NRZI-encode to the [1,1,0,0] repeating
        # line pattern the correlator preamble uses
        # (reference: python/ais_demod.py:36).
        training = np.array([0, 1] * 12, dtype=np.uint8)
        levels = nrzi_encode(training, initial_level=1)
        expected = np.tile([0, 0, 1, 1], 6)
        np.testing.assert_array_equal(levels, expected)


class TestFrameBits:
    def test_structure(self):
        payload = bytes(range(21))
        wire = frame_bits(payload, ramp_bits=8)
        assert wire[:8].sum() == 0
        np.testing.assert_array_equal(wire[8:32], np.array([0, 1] * 12))
        np.testing.assert_array_equal(wire[32:40], [0, 1, 1, 1, 1, 1, 1, 0])
        np.testing.assert_array_equal(wire[-8:], [0, 1, 1, 1, 1, 1, 1, 0])

    def test_wire_bits_deframe(self):
        payload = bytes(range(30))
        frames = deframe(frame_bits(payload))
        assert len(frames) == 1 and frames[0].payload == payload


class TestConfigSerialization:
    def test_roundtrip(self):
        import dataclasses

        from ais_tpu.core.params import (
            ReceiverConfig,
            config_from_dict,
            config_to_dict,
        )

        cfg = ReceiverConfig().with_offset(25e3, "B")
        cfg = dataclasses.replace(
            cfg, demod=dataclasses.replace(cfg.demod, demod_mode="mlse")
        )
        d = config_to_dict(cfg)
        import json

        back = config_from_dict(json.loads(json.dumps(d)))
        assert back == cfg
