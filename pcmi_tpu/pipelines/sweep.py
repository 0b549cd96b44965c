"""Multi-AOI sweep — BASELINE.json config 5.

Runs the multi-day fusion (ICP cross-date registration + kNN outlier
cleanup + gridding) over a list of AOIs, with per-stage profiling scopes
and an optional content-addressed stage cache so interrupted sweeps
resume. Each AOI is independent — on a multi-host deployment the sweep
maps onto the DCN/data axis (AOIs never communicate); locally it streams
them through the one compiled pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from pcmi_tpu.config import PipelineConfig
from pcmi_tpu.geometry.pairs import ImageMeta
from pcmi_tpu.pipelines.multiday import FusedCloud, MultiDayFusion
from pcmi_tpu.utils.profiling import scope


@dataclass
class AOISpec:
    name: str
    images: Sequence
    rpcs: Sequence
    metas: Sequence[ImageMeta]
    lon_range: tuple
    lat_range: tuple


@dataclass
class SweepResult:
    fused: Dict[str, FusedCloud] = field(default_factory=dict)
    stats: Dict[str, dict] = field(default_factory=dict)


class MultiAOISweep:
    def __init__(self, cfg: PipelineConfig = PipelineConfig(),
                 cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.fusion = MultiDayFusion(cfg)
        self.cache = None
        if cache_dir:
            from pcmi_tpu.utils.cache import StageCache

            self.cache = StageCache(cache_dir)

    def run(self, aois: Sequence[AOISpec], points_per_pair: int = 1 << 16,
            grid_cell: Optional[float] = None,
            with_kmeans: bool = True) -> SweepResult:
        out = SweepResult()
        for aoi in aois:
            with scope(f"aoi:{aoi.name}"):
                fused = self.fusion.run(
                    aoi.images, aoi.rpcs, aoi.metas,
                    aoi.lon_range, aoi.lat_range,
                    points_per_pair=points_per_pair,
                    with_kmeans=with_kmeans, grid_cell=grid_cell,
                    cache=self.cache,
                )
            keep = np.asarray(fused.weights) > 0
            out.fused[aoi.name] = fused
            out.stats[aoi.name] = {
                "points": int(keep.sum()),
                "dsm_filled": float(np.isfinite(np.asarray(fused.dsm)).mean()),
                "icp_rmse_max": float(np.max(np.asarray(fused.icp_rmse))),
            }
        return out
