"""User-facing pipeline components."""

from pcmi_tpu.pipelines.height_map import (
    HeightMapExtractor,
    HeightMapPipeline,
    PairProduct,
    pair_core,
    product_point_cloud,
    required_max_disp,
)
from pcmi_tpu.pipelines.multiday import FusedCloud, MultiDayFusion

__all__ = [
    "HeightMapExtractor",
    "HeightMapPipeline",
    "PairProduct",
    "pair_core",
    "product_point_cloud",
    "required_max_disp",
    "FusedCloud",
    "MultiDayFusion",
]
