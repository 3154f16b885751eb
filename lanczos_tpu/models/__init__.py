from lanczos_tpu.models.upscaler import Upscaler, upscale  # noqa: F401
