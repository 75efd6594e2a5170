"""User-facing receiver objects.

`BasebandReceiver` is the equivalent of the reference's single-channel
`ais_rx` path minus the channelizer (reference: python/radio.py:40-73,
with `-S` single-channel semantics from python/radio.py:85-86): feed it
channel-rate complex baseband (default 48 ksps), get decoded packets.

`ChannelReceiver` adds the front-end channelizer: feed it wideband IQ
centered at 162.0 MHz, it mixes/filters/decimates to one AIS channel and
decodes (reference: python/radio.py:49-63).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from ais_tpu.core.params import (
    ChannelizerConfig,
    DeframerConfig,
    DemodConfig,
    ReceiverConfig,
)
from ais_tpu.ops.firdes import low_pass
from ais_tpu.ops.fir import freq_xlating_fir_decimate, mixer_phase
from ais_tpu.pipeline.host import DecodedPacket, PacketDeduper, decode_block_records
from ais_tpu.pipeline.receiver import (
    frame_stream,
    jit_burst_demod,
    required_halo,
)


class BasebandReceiver:
    """Decode AIS packets from channel-rate complex baseband."""

    def __init__(
        self,
        demod: DemodConfig = DemodConfig(),
        deframer: DeframerConfig = DeframerConfig(),
        designator: str = "A",
        block_len: int = 16384,
        core_len: int | None = None,
    ):
        self.demod_cfg = demod
        self.deframer_cfg = deframer
        self.designator = designator
        self.block_len = block_len
        self.core_len = core_len or (block_len - required_halo(demod))
        self._demod = jit_burst_demod(demod, block_len, self.core_len)
        self._deduper = PacketDeduper(window=2 * demod.burst_len)
        self._consumed = 0

    def process(self, iq: np.ndarray) -> list[DecodedPacket]:
        """Decode a contiguous chunk of baseband samples.

        Stateless across calls except packet dedup; callers streaming
        continuously should pass overlapping chunks or use StreamDriver.
        """
        blocks = frame_stream(iq, self.block_len, self.core_len)
        packets: list[DecodedPacket] = []
        for b in range(blocks.shape[0]):
            records = self._demod(jnp.asarray(blocks[b]))
            packets.extend(
                decode_block_records(
                    records,
                    block_start_sample=self._consumed + b * self.core_len,
                    designator=self.designator,
                    deframer=self.deframer_cfg,
                    deduper=self._deduper,
                    fftlen=self.demod_cfg.fftlen,
                )
            )
        self._consumed += int(np.asarray(iq).size)
        return packets

    def sentences(self, iq: np.ndarray) -> list[str]:
        return [p.nmea for p in self.process(iq)]


class ChannelReceiver:
    """Wideband IQ -> one AIS channel via freq-xlating FIR -> decode."""

    def __init__(
        self,
        config: ReceiverConfig = ReceiverConfig(),
        block_len: int = 16384,
    ):
        self.config = config
        chan = config.channelizer
        self.decim = chan.resolved_decimation()
        self.taps = low_pass(1.0, chan.input_rate, chan.cutoff_hz, chan.transition_hz)
        out_rate = chan.input_rate / self.decim
        sps = out_rate / config.demod.bit_rate
        demod = dataclasses.replace(config.demod, samples_per_symbol=sps)
        self.baseband = BasebandReceiver(
            demod=demod,
            deframer=config.deframer,
            designator=config.designator,
            block_len=block_len,
        )
        self._consumed = 0

    def process(self, iq: np.ndarray) -> list[DecodedPacket]:
        chan = self.config.channelizer
        phase0 = mixer_phase(chan.offset_hz, chan.input_rate, self._consumed)
        baseband = freq_xlating_fir_decimate(
            jnp.asarray(np.asarray(iq, dtype=np.complex64)),
            self.taps,
            chan.offset_hz,
            chan.input_rate,
            self.decim,
            phase0=phase0,
        )
        self._consumed += int(np.asarray(iq).size)
        return self.baseband.process(np.asarray(baseband))

    def sentences(self, iq: np.ndarray) -> list[str]:
        return [p.nmea for p in self.process(iq)]
