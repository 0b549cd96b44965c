"""Shared jittable array ops.

One library replacing the reference's four duplicated copies of
``normalize_band`` / ``smart_crop`` (reference ``viewer.py:76-91``,
``members/marcin/utils.py:7-40``, and three copies under ``members/jasraj/*``
— see SURVEY §2.5 "Shared utils").
"""

from pcmi_tpu.ops.normalize import (
    normalise_image,
    percentile_stretch,
    robust_bounds,
)
from pcmi_tpu.ops.filters import (
    box_filter,
    gaussian_filter,
    gaussian_kernel1d,
    guided_filter,
)
from pcmi_tpu.ops.morphology import (
    binary_closing,
    binary_dilation,
    binary_erosion,
    grey_erosion,
    distance_transform,
)
from pcmi_tpu.ops.warp import (
    affine_warp,
    homography_warp,
    map_coordinates,
)

__all__ = [
    "normalise_image",
    "percentile_stretch",
    "robust_bounds",
    "box_filter",
    "gaussian_filter",
    "gaussian_kernel1d",
    "guided_filter",
    "binary_closing",
    "binary_dilation",
    "binary_erosion",
    "grey_erosion",
    "distance_transform",
    "affine_warp",
    "homography_warp",
    "map_coordinates",
]
