from ais_tpu.parallel.mesh import make_stream_time_mesh, make_time_mesh  # noqa: F401
from ais_tpu.parallel.pipeline import (  # noqa: F401
    make_halo_exchange_demod,
    make_sharded_demod,
    make_sharded_stream_demod,
    make_sharded_wire_pipeline,
)
