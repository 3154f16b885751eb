from lanczos_tpu.utils.metrics import psnr, rms_error  # noqa: F401
