"""Native C++ kernels must agree bit-for-bit with the Python/numpy twins."""

import numpy as np
import pytest

from ais_tpu import native
from ais_tpu.decode.crc import crc16_x25 as crc_py
from ais_tpu.decode.hdlc import deframe as deframe_py
from ais_tpu.tx import frame_bits

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not buildable"
)


class TestIqConvert:
    def test_i16(self):
        raw = np.array([0, 16384, -32768, 32767], dtype=np.int16)
        out = native.iq_convert(raw, "ci16")
        np.testing.assert_allclose(out.real, [0.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(out.imag, [0.5, 32767 / 32768.0], atol=1e-6)

    def test_u8_matches_numpy(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, size=2000, dtype=np.uint8)
        got = native.iq_convert(raw, "cu8")
        f = (raw.astype(np.float32) - 127.5) / 127.5
        want = (f[0::2] + 1j * f[1::2]).astype(np.complex64)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestCrc:
    def test_check_value(self):
        assert native.crc16_x25(b"123456789") == 0x906E

    def test_matches_python(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            data = rng.integers(0, 256, size=rng.integers(1, 64), dtype=np.uint8).tobytes()
            assert native.crc16_x25(data) == crc_py(data)


class TestHdlc:
    def test_matches_python_deframer(self):
        rng = np.random.default_rng(2)
        for seed in range(10):
            rng = np.random.default_rng(seed)
            payloads = [
                rng.integers(0, 256, size=rng.integers(11, 64), dtype=np.uint8).tobytes()
                for _ in range(3)
            ]
            wire = np.concatenate(
                [rng.integers(0, 2, 50).astype(np.uint8)]
                + [frame_bits(p, ramp_bits=4) for p in payloads]
                + [rng.integers(0, 2, 50).astype(np.uint8)]
            )
            py = [f.payload for f in deframe_py(wire)]
            nat = [p for p, _ in native.hdlc_deframe(wire)]
            assert nat == py
            assert py == payloads

    def test_rejects_bad_crc(self):
        payload = bytes(range(21))
        wire = frame_bits(payload)
        wire[60] ^= 1
        assert native.hdlc_deframe(wire) == []

    def test_packed_batch_matches_per_burst(self):
        """hdlc_deframe_packed_batch on packed (bits, valid) planes must
        reproduce the per-burst hdlc_deframe results lane by lane —
        payloads, start_bit coordinates, and lane attribution."""
        rng = np.random.default_rng(3)
        n_lanes, n_sym = 12, 1536
        packed = np.zeros((n_lanes, 2, n_sym // 8), np.uint8)
        want = {}
        lanes = []
        for lane in range(n_lanes):
            if lane % 3 == 0:
                continue  # invalid lane: must be skipped entirely
            lanes.append(lane)
            payload = rng.integers(0, 256, size=24, dtype=np.uint8).tobytes()
            body = np.concatenate(
                [rng.integers(0, 2, 40).astype(np.uint8),
                 frame_bits(payload, ramp_bits=4)]
            )
            bits = np.zeros(n_sym, np.uint8)
            valid = np.zeros(n_sym, np.uint8)
            # scatter the burst bits over a valid-mask with gaps
            idx = np.sort(rng.choice(n_sym, size=body.size, replace=False))
            bits[idx] = body
            valid[idx] = 1
            packed[lane, 0] = np.packbits(bits)
            packed[lane, 1] = np.packbits(valid)
            want[lane] = native.hdlc_deframe(body)
        lanes = np.asarray(lanes, np.int32)
        got = native.hdlc_deframe_packed_batch(packed, lanes, n_sym)
        by_lane = {}
        for payload, start_bit, li in got:
            by_lane.setdefault(int(lanes[li]), []).append((payload, start_bit))
        for lane in lanes:
            assert by_lane.get(int(lane), []) == want[int(lane)]
