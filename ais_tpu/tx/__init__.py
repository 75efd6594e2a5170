from ais_tpu.tx.frame import (  # noqa: F401
    aivdm_payload_to_bytes,
    frame_bits,
    make_packet_iq,
    nrzi_encode,
    stuff,
)
from ais_tpu.tx.gmsk import (  # noqa: F401
    modulate_bits,
    modulate_symbols,
    preamble_waveform,
)
