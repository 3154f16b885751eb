from lanczos_tpu.ops.resample_xla import (  # noqa: F401
    apply_banded,
    quantize_uint8,
    resample_2d_xla,
)
from lanczos_tpu.ops.fixed_point import hls_upscale_xla  # noqa: F401
