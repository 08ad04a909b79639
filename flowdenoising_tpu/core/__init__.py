from flowdenoising_tpu.core.axis_filter import gaussian_pass, of_pass, pad_stack
from flowdenoising_tpu.core.pipeline import denoise, gaussian_denoise

__all__ = ["gaussian_pass", "of_pass", "pad_stack", "denoise", "gaussian_denoise"]
