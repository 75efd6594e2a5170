from ais_tpu.pipeline.api import BasebandReceiver, ChannelReceiver  # noqa: F401
from ais_tpu.pipeline.host import (  # noqa: F401
    DecodedPacket,
    PacketDeduper,
    decode_block_records,
)
from ais_tpu.pipeline.receiver import (  # noqa: F401
    BurstRecords,
    frame_stream,
    jit_burst_demod,
    make_burst_demod,
    required_halo,
)
