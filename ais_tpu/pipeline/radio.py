"""Dual-channel AIS radio: wideband capture -> channel A + B packets.

Equivalent of the reference's `ais_radio` top block
(reference: python/radio.py:75-98): one source centered at 162.0 MHz
feeds two `ais_rx` paths at -25 kHz (A, 161.975 MHz) and +25 kHz
(B, 162.025 MHz), or a single 0-offset path in single-channel mode.
Here the two channelizers and both demodulators run inside one process
over shared input arrays; `process()` is feedable from any
`ais_tpu.io` source.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np

from ais_tpu.core.params import ReceiverConfig, dual_channel_configs
from ais_tpu.io.sources import SampleSource
from ais_tpu.pipeline.api import ChannelReceiver
from ais_tpu.pipeline.host import DecodedPacket


class AisRadio:
    """Decode both AIS channels from a 162.0 MHz-centered stream."""

    def __init__(
        self,
        sample_rate: float = 250e3,
        single_channel: bool = False,
        block_len: int = 16384,
        demod=None,
    ):
        self.sample_rate = sample_rate
        self._demod_override = demod
        if single_channel:
            cfg = ReceiverConfig()
            cfg = cfg.with_offset(0.0, "A")
            import dataclasses

            cfg = dataclasses.replace(
                cfg,
                channelizer=dataclasses.replace(
                    cfg.channelizer, input_rate=sample_rate, offset_hz=0.0
                ),
            )
            configs = (cfg,)
        else:
            configs = dual_channel_configs(sample_rate)
        if demod is not None:
            import dataclasses

            configs = tuple(
                dataclasses.replace(c, demod=demod) for c in configs
            )
        self.rx_paths = [ChannelReceiver(c, block_len=block_len) for c in configs]

    def process(self, iq: np.ndarray) -> list[DecodedPacket]:
        packets: list[DecodedPacket] = []
        for rx in self.rx_paths:
            packets.extend(rx.process(iq))
        packets.sort(key=lambda p: p.abs_sample)
        return packets

    # -- pubsub-style runtime controls (reference: python/radio.py:93-149).
    # Gain/rate are hardware-source properties; for file/UDP ingest they
    # are bookkeeping, mirroring the reference's non-live-source behavior
    # (get_gain returns 0, python/radio.py:145-146).

    def set_threshold(self, threshold: float) -> None:
        """Working version of the reference's broken set_threshold
        (python/radio.py:141-143)."""
        for rx in self.rx_paths:
            rx.baseband.set_threshold(threshold)

    def get_threshold(self) -> float:
        return self.rx_paths[0].baseband.get_threshold()

    def set_gain(self, gain: float) -> float:
        self._gain = gain
        return self.get_gain()

    def get_gain(self) -> float:
        return getattr(self, "_gain", 0.0)

    def get_rate(self) -> float:
        return self.sample_rate

    def run(
        self,
        source: SampleSource,
        chunk_len: int = 1 << 20,
        on_packet: Callable[[DecodedPacket], None] | None = None,
    ) -> Iterator[DecodedPacket]:
        """Stream from a source, yielding packets as they decode.

        The reference equivalent is `tb.run()` handing control to the GR
        scheduler (apps/ais_rx:19); here the host loop pulls chunks and
        the TPU pipeline drains them.
        """
        for chunk in source.chunks(chunk_len):
            for p in self.process(chunk):
                if on_packet is not None:
                    on_packet(p)
                yield p
