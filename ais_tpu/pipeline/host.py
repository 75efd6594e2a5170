"""Host-side back half: burst bit tables -> HDLC frames -> NMEA sentences.

The stream->message boundary of the reference (hdlc_deframer's PDU output
feeding pdu_to_nmea, reference: python/radio.py:64-73) maps here to the
device->host boundary: the TPU produces fixed-size per-burst bit tensors;
this module deframes them, deduplicates packets that were detected twice
(e.g. a correlator double-fire on one burst), and renders AIVDM sentences.
"""

from __future__ import annotations

import logging
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


# Packets are anchored to their *own* preamble sample (frame start-bit
# arithmetic below), so two sightings of one transmission land within a
# few samples of each other while distinct packets are >= one minimum
# frame (~800 samples at 5 sps) apart.  512 cleanly separates the two.
DEDUP_WINDOW = 512

# Decoded bit index 0 sits at the burst window start = the preamble
# start; the opening HDLC flag follows the 24-bit training sequence
# (reference python/ais_demod.py:36 — [1,1,0,0]*7 pattern, first 24 bits
# before the flag).
PREAMBLE_BITS = 24


@dataclass
class PacketDeduper:
    """Drop repeats of the same payload within a sample-distance window.

    Two detections of one transmission sit within a few samples of each
    other (same preamble anchor); genuine retransmissions of identical
    payloads are at least a frame apart.
    """

    window: int = DEDUP_WINDOW
    # Packets arrive only roughly ordered: a burst window spans several
    # packet lengths, so a transmission's duplicate sighting can arrive
    # *after* packets anchored later.  Retain history well past the
    # match window so out-of-order arrivals still find their twin.
    retention: int = 16384
    _recent: list = field(default_factory=list)

    def admit(self, packet: DecodedPacket) -> bool:
        self._recent = [
            (p, s) for (p, s) in self._recent if packet.abs_sample - s < self.retention
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
    samples_per_symbol: float = 5.0,
) -> list[DecodedPacket]:
    """Deframe one block's BurstRecords (host numpy copies) into packets."""
    valid = np.asarray(records.valid)
    n_detected = int(np.asarray(getattr(records, "n_detected", 0)))
    if n_detected > valid.size:
        # The fixed-size burst table capped out: bursts were dropped.
        # The reference has no analogue (its tag stream is unbounded);
        # here capacity is static, so overflow must be loud.
        logging.getLogger("ais_tpu").warning(
            "burst table overflow: %d peaks detected in block at sample %d "
            "but max_bursts_per_block=%d — raise DemodConfig.max_bursts_per_block",
            n_detected,
            block_start_sample,
            valid.size,
        )
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
        win_start = (
            int(np.asarray(records.win_start)[k])
            if hasattr(records, "win_start")
            else int(positions[k])
        )
        for fr in frames:
            # Anchor the packet to its own preamble start: a burst window
            # spans several packet lengths, so frames past the first
            # belong to *later* transmissions — position them by their
            # flag bit within the extraction window, not by the window's
            # detection peak.  Bit b sits near win_start + b*sps; the
            # opening flag follows the 24-bit training sequence.
            anchor = win_start + int(
                round((fr.start_bit - PREAMBLE_BITS) * samples_per_symbol)
            )
            packet = DecodedPacket(
                payload=fr.payload,
                abs_sample=block_start_sample + anchor,
                designator=designator,
                corr_mag=float(mags[k]),
                freq_est_hz=float(freq_est[chunk]) if freq_est.size else 0.0,
            )
            if deduper is None or deduper.admit(packet):
                packets.append(packet)
    return packets
