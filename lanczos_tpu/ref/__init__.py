from lanczos_tpu.ref.oracle import (  # noqa: F401
    c_oracle_upscale,
    clean_resample_2d,
    oracle_resample_axis0,
)
from lanczos_tpu.ref.hls_sim import hls_stream_upscale  # noqa: F401
