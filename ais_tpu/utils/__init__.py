from ais_tpu.utils.bits import (  # noqa: F401
    bits_to_bytes_lsb_first,
    bits_to_bytes_msb_first,
    bytes_to_bits_lsb_first,
    bytes_to_bits_msb_first,
)
