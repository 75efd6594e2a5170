"""Host-side back half: burst bit tables -> HDLC frames -> NMEA sentences.

The stream->message boundary of the reference (hdlc_deframer's PDU output
feeding pdu_to_nmea, reference: python/radio.py:64-73) maps here to the
device->host boundary: the TPU produces fixed-size per-burst bit tensors;
this module deframes them, deduplicates packets that were detected twice
(e.g. a correlator double-fire on one burst), and renders AIVDM sentences.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ais_tpu.core.params import DeframerConfig
from ais_tpu.decode.hdlc import deframe
from ais_tpu.decode.nmea import frame_to_nmea


@dataclass(frozen=True)
class DecodedPacket:
    payload: bytes
    abs_sample: int        # absolute sample index of the burst's preamble
    designator: str
    corr_mag: float
    freq_est_hz: float

    @property
    def nmea(self) -> str:
        return frame_to_nmea(self.payload, self.designator)

    @property
    def nmea_pdu(self) -> bytes:
        """Sentence as bytes — the reference's `to_nmea` u8vector-PDU
        output port (lib/pdu_to_nmea_impl.cc:137-144)."""
        return self.nmea.encode("ascii")


@dataclass
class PacketDeduper:
    """Drop repeats of the same payload within a sample-distance window.

    Two detections of one transmission sit within a burst length of each
    other; genuine retransmissions of identical payloads are seconds
    (>= tens of thousands of samples) apart.
    """

    window: int = 8192
    _recent: list = field(default_factory=list)

    def admit(self, packet: DecodedPacket) -> bool:
        self._recent = [
            (p, s) for (p, s) in self._recent if packet.abs_sample - s < self.window
        ]
        for payload, sample in self._recent:
            if payload == packet.payload and abs(packet.abs_sample - sample) < self.window:
                return False
        self._recent.append((packet.payload, packet.abs_sample))
        return True


def decode_block_records(
    records,
    block_start_sample: int,
    designator: str = "A",
    deframer: DeframerConfig = DeframerConfig(),
    deduper: PacketDeduper | None = None,
    fftlen: int = 1024,
) -> list[DecodedPacket]:
    """Deframe one block's BurstRecords (host numpy copies) into packets."""
    valid = np.asarray(records.valid)
    positions = np.asarray(records.position)
    mags = np.asarray(records.mag)
    bits = np.asarray(records.bits)
    bit_valid = np.asarray(records.bit_valid)
    freq_est = np.asarray(records.freq_est)
    packets: list[DecodedPacket] = []
    for k in np.nonzero(valid)[0]:
        burst_bits = bits[k][bit_valid[k]]
        frames = deframe(
            burst_bits, deframer.min_length_bytes, deframer.max_length_bytes
        )
        chunk = min(int(positions[k]) // fftlen, freq_est.size - 1) if freq_est.size else 0
        for fr in frames:
            packet = DecodedPacket(
                payload=fr.payload,
                abs_sample=block_start_sample + int(positions[k]),
                designator=designator,
                corr_mag=float(mags[k]),
                freq_est_hz=float(freq_est[chunk]) if freq_est.size else 0.0,
            )
            if deduper is None or deduper.admit(packet):
                packets.append(packet)
    return packets
