"""User-facing receiver objects.

`BasebandReceiver` is the equivalent of the reference's single-channel
`ais_rx` path minus the channelizer (reference: python/radio.py:40-73,
with `-S` single-channel semantics from python/radio.py:85-86): feed it
channel-rate complex baseband (default 48 ksps), get decoded packets.

`ChannelReceiver` adds the front-end channelizer: feed it wideband IQ
centered at 162.0 MHz, it mixes/filters/decimates to one AIS channel and
decodes (reference: python/radio.py:49-63).

Both are *streaming-safe*: consecutive `process()` calls are treated as
one continuous stream.  The receiver carries the tail of each call into
the next (the tensor-pipeline replacement for GNU Radio's ring-buffer
history) so packets straddling a call boundary decode exactly once —
the position-keyed deduper drops the second sighting.
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
        if deframer.max_length_bytes > demod.max_frame_bytes:
            raise ValueError(
                f"DeframerConfig.max_length_bytes={deframer.max_length_bytes} "
                f"exceeds the demod window's frame capacity "
                f"({demod.max_frame_bytes} bytes at burst_len="
                f"{demod.burst_len}): the device extraction window would "
                f"truncate long frames before the deframer saw them.  Use "
                f"ais_tpu.core.params.demod_for_max_frame("
                f"{deframer.max_length_bytes}) to scale burst_len (and pass "
                f"a block_len comfortably above burst_len + halo)."
            )
        self.demod_cfg = demod
        self.deframer_cfg = deframer
        self.designator = designator
        self.block_len = block_len
        self.core_len = core_len or (block_len - required_halo(demod))
        if self.core_len <= 0:
            raise ValueError(f"block_len {block_len} too small for halo")
        self._demod = jit_burst_demod(demod, block_len, self.core_len)
        self._deduper = PacketDeduper()
        # Streaming carry: tail samples re-presented to the next call so
        # call-boundary packets are never lost.
        self._overlap = self.block_len - self.core_len
        self._tail = np.zeros(0, dtype=np.complex64)
        self._tail_start = 0  # absolute sample index of _tail[0]
        self._next_start = 0  # absolute index of the next fresh sample

    def process(
        self, iq: np.ndarray, start_sample: int | None = None
    ) -> list[DecodedPacket]:
        """Decode a chunk that continues the stream of previous calls.

        `start_sample` overrides the stream position (e.g. when an
        upstream channelizer owns the sample counter); it must equal the
        caller's absolute index of iq[0] and be monotonic.
        """
        iq = np.asarray(iq, dtype=np.complex64)
        if start_sample is not None and start_sample != self._next_start:
            # Position jump: reset carry.
            self._tail = np.zeros(0, dtype=np.complex64)
            self._next_start = start_sample
        self._tail_start = self._next_start - self._tail.size
        arr = np.concatenate([self._tail, iq]) if self._tail.size else iq
        base = self._tail_start
        self._next_start += iq.size

        packets: list[DecodedPacket] = []
        if arr.size > 0:
            from ais_tpu.ops.cplx import to_planes

            blocks = frame_stream(arr, self.block_len, self.core_len)
            for b in range(blocks.shape[0]):
                records = self._demod(jnp.asarray(to_planes(blocks[b])))
                packets.extend(
                    decode_block_records(
                        records,
                        block_start_sample=base + b * self.core_len,
                        designator=self.designator,
                        deframer=self.deframer_cfg,
                        deduper=self._deduper,
                        fftlen=self.demod_cfg.fftlen,
                        samples_per_symbol=self.demod_cfg.samples_per_symbol,
                    )
                )
        keep = min(arr.size, self._overlap)
        self._tail = arr[arr.size - keep :]
        return packets

    def sentences(self, iq: np.ndarray) -> list[str]:
        return [p.nmea for p in self.process(iq)]

    def set_threshold(self, threshold: float) -> None:
        """Runtime correlator-threshold mutation.

        The reference *intends* this via pubsub but the call chain is
        broken (python/radio.py:141-143 calls a method ais_rx never
        defines — a latent bug SURVEY.md flags).  Here it rebuilds the
        jitted demodulator with the new static threshold.
        """
        self.demod_cfg = dataclasses.replace(self.demod_cfg, corr_threshold=threshold)
        self._demod = jit_burst_demod(self.demod_cfg, self.block_len, self.core_len)

    def get_threshold(self) -> float:
        return self.demod_cfg.resolved_corr_threshold

    # -- checkpoint / resume ------------------------------------------------
    # The reference has none (SURVEY.md §5.4): its DSP state lives in C++
    # block members and dies with the process.  Here the entire stream
    # state is the tail carry + positions + dedup memory, so a snapshot is
    # a small dict and resume is exact.

    def get_state(self) -> dict:
        return {
            "tail": self._tail.copy(),
            "next_start": self._next_start,
            "dedup_recent": list(self._deduper._recent),
        }

    def set_state(self, state: dict) -> None:
        self._tail = np.asarray(state["tail"], dtype=np.complex64).copy()
        self._next_start = int(state["next_start"])
        self._deduper._recent = list(state["dedup_recent"])


class ChannelReceiver:
    """Wideband IQ -> one AIS channel via freq-xlating FIR -> decode.

    When the decimated rate is not an integer number of samples per
    symbol (e.g. the reference's 250 ksps / 5 = 50 ksps, sps 5.208), a
    polyphase arbitrary resampler brings the channel to exactly
    `target_sps` samples/symbol before demodulation — the topology of the
    reference's development flowgraph (python/ais.grc:1523), which is
    strictly better than its installed app path (the app correlates a
    5.208-sps signal against a 5-sps preamble waveform,
    python/ais_demod.py:37's integer-sps gmsk_mod).
    """

    def __init__(
        self,
        config: ReceiverConfig = ReceiverConfig(),
        block_len: int = 16384,
        target_sps: int = 5,
    ):
        self.config = config
        chan = config.channelizer
        self.decim = chan.resolved_decimation()
        self.taps = low_pass(1.0, chan.input_rate, chan.cutoff_hz, chan.transition_hz)
        out_rate = chan.input_rate / self.decim
        sps = out_rate / config.demod.bit_rate
        if abs(sps - round(sps)) > 1e-6:
            self.resample_rate = (target_sps * config.demod.bit_rate) / out_rate
            sps = float(target_sps)
        else:
            self.resample_rate = None
            sps = float(round(sps))
        demod = dataclasses.replace(config.demod, samples_per_symbol=sps)
        self.baseband = BasebandReceiver(
            demod=demod,
            deframer=config.deframer,
            designator=config.designator,
            block_len=block_len,
        )
        # Raw-domain streaming carry: enough to re-present the FIR history
        # plus one decimation phase; decode-domain carry lives in the
        # BasebandReceiver.
        self._ntaps = int(self.taps.size)
        self._tail = np.zeros(0, dtype=np.complex64)
        self._next_start = 0
        # Fractional-rate streaming state: the resampler carries its own
        # input tail and output counter so packets straddling a process()
        # boundary survive (the reference's default 250 ksps mode,
        # python/radio.py:120-121, is exactly this path).
        if self.resample_rate is not None:
            from ais_tpu.ops.resample import PfbArbResampler

            self._resampler = PfbArbResampler(self.resample_rate)
        else:
            self._resampler = None

    def process(self, iq: np.ndarray) -> list[DecodedPacket]:
        chan = self.config.channelizer
        iq = np.asarray(iq, dtype=np.complex64)
        arr = np.concatenate([self._tail, iq]) if self._tail.size else iq
        start = self._next_start - self._tail.size  # abs index of arr[0]
        self._next_start += iq.size
        if arr.size < self._ntaps:
            self._tail = arr
            return []
        phase0 = mixer_phase(chan.offset_hz, chan.input_rate, start)
        baseband = np.asarray(
            freq_xlating_fir_decimate(
                jnp.asarray(arr),
                self.taps,
                chan.offset_hz,
                chan.input_rate,
                self.decim,
                phase0=phase0,
            )
        )
        # Baseband sample b sits at raw index start + b*decim; keep the raw
        # tail so the next call's first baseband sample continues the grid.
        n_base = baseband.shape[-1]
        consumed_raw = n_base * self.decim
        self._tail = arr[consumed_raw:]
        if self._resampler is not None:
            out_start = self._resampler.outputs_emitted
            resampled = self._resampler.process(baseband)
            # The resampler's absolute output grid is the stream position:
            # concatenated calls produce the identical sample sequence as
            # one whole-stream call, so boundary packets decode exactly
            # once through the BasebandReceiver's overlap carry.
            return self.baseband.process(resampled, start_sample=out_start)
        return self.baseband.process(baseband, start_sample=start // self.decim)

    def sentences(self, iq: np.ndarray) -> list[str]:
        return [p.nmea for p in self.process(iq)]

    # -- checkpoint / resume -------------------------------------------------
    def get_state(self) -> dict:
        state = {
            "tail": self._tail.copy(),
            "next_start": self._next_start,
            "baseband": self.baseband.get_state(),
        }
        if self._resampler is not None:
            state["resampler"] = self._resampler.get_state()
        return state

    def set_state(self, state: dict) -> None:
        self._tail = np.asarray(state["tail"], dtype=np.complex64).copy()
        self._next_start = int(state["next_start"])
        self.baseband.set_state(state["baseband"])
        if self._resampler is not None:
            self._resampler.set_state(state["resampler"])
