from flowdenoising_tpu.ops.warp import warp_slices
from flowdenoising_tpu.ops.resize import resize_linear, resize_area, linear_resize_matrix, area_resize_matrix
from flowdenoising_tpu.ops.blur import gaussian_blur, box_blur, opencv_gaussian_taps
from flowdenoising_tpu.ops.farneback import farneback_flow, poly_expand

__all__ = [
    "warp_slices",
    "resize_linear",
    "resize_area",
    "linear_resize_matrix",
    "area_resize_matrix",
    "gaussian_blur",
    "box_blur",
    "opencv_gaussian_taps",
    "farneback_flow",
    "poly_expand",
]
