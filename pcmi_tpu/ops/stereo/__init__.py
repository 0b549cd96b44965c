"""Dense stereo matching: XLA scans + Pallas kernels + coarse-to-fine."""

from pcmi_tpu.ops.stereo.matching import (
    DisparityResult,
    build_cost_volume,
    census_transform,
    compute_disparity,
    derive_right_volume,
    lr_consistency,
    refine_disparity,
    sgm_aggregate,
    wta_disparity,
)
from pcmi_tpu.ops.stereo.banded import banded_disparity, window_coverage
from pcmi_tpu.ops.stereo.hierarchical import compute_disparity_hierarchical

__all__ = [
    "DisparityResult",
    "banded_disparity",
    "window_coverage",
    "build_cost_volume",
    "census_transform",
    "compute_disparity",
    "compute_disparity_hierarchical",
    "derive_right_volume",
    "lr_consistency",
    "refine_disparity",
    "sgm_aggregate",
    "wta_disparity",
]
