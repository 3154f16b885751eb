from lanczos_tpu.core.config import (  # noqa: F401
    EdgeMode,
    Order,
    Precision,
    Profile,
    ResampleConfig,
)
from lanczos_tpu.core import filters, weights  # noqa: F401
