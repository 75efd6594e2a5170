from ais_tpu.sync.corr import (  # noqa: F401
    autocorr_threshold,
    detect_bursts,
    matched_filter,
)
from ais_tpu.sync.timing import msk_timing_recovery  # noqa: F401
