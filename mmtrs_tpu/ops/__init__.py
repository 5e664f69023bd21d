from mmtrs_tpu.ops.color import rgb_to_lab, lab_to_rgb, rgb_to_hsv, hsv_to_rgb, rgb_to_gray
from mmtrs_tpu.ops.warp import (
    warp_affine,
    warp_perspective,
    rotation_matrix,
    invert_affine,
)
from mmtrs_tpu.ops.resize import resize_bilinear, center_crop_resize, crop_box_resize
from mmtrs_tpu.ops.clahe import clahe, clahe_rgb
from mmtrs_tpu.ops.deskew import deskew_batch, estimate_skew_angle

__all__ = [
    "rgb_to_lab",
    "lab_to_rgb",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "rgb_to_gray",
    "warp_affine",
    "warp_perspective",
    "rotation_matrix",
    "invert_affine",
    "resize_bilinear",
    "center_crop_resize",
    "crop_box_resize",
    "clahe",
    "clahe_rgb",
    "deskew_batch",
    "estimate_skew_angle",
]
