"""Accuracy evaluation against synthetic ground truth.

One shared routine for the pytest gates, the scene-family sweep and
``bench.py`` — so every accuracy number in the repo is computed the same
way (the reference has no quantitative evaluation at all; its quality
evidence is visual layer inspection, SURVEY §4).
"""

from __future__ import annotations

import numpy as np

from pcmi_tpu.config import PipelineConfig
from pcmi_tpu.geometry.synthetic import SyntheticScene, aoi_lonlat_ranges
from pcmi_tpu.pipelines.height_map import HeightMapPipeline


def truth_on_grid(scene: SyntheticScene, xyz) -> tuple[np.ndarray, np.ndarray]:
    """Bilinearly sample the true terrain height at triangulated (x, y).

    Returns ``(truth, in_bounds)`` on the product grid.
    """
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    gx = (np.asarray(xyz[..., 0]) - ox) / scene.ground_gsd
    gy = (np.asarray(xyz[..., 1]) - oy) / scene.ground_gsd
    gxc = np.clip(gx, 0, terr.shape[1] - 1)
    gyc = np.clip(gy, 0, terr.shape[0] - 1)
    x0 = np.floor(gxc).astype(int)
    y0 = np.floor(gyc).astype(int)
    x1 = np.clip(x0 + 1, 0, terr.shape[1] - 1)
    y1 = np.clip(y0 + 1, 0, terr.shape[0] - 1)
    tx = gxc - x0
    ty = gyc - y0
    t = (
        terr[y0, x0] * (1 - ty) * (1 - tx)
        + terr[y0, x1] * (1 - ty) * tx
        + terr[y1, x0] * ty * (1 - tx)
        + terr[y1, x1] * ty * tx
    )
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) \
        & (gy >= 0) & (gy < terr.shape[0] - 1)
    return t, inb


def evaluate_pair_accuracy(scene: SyntheticScene,
                           cfg: PipelineConfig,
                           view_idx=(0, 1)) -> dict:
    """Run the flagship pair pipeline on one scene and score it.

    Returns height RMSE / bias / completeness vs the scene's exact terrain
    (the ≤1 m RMSE north-star gate, BASELINE.json).  ``completeness`` is
    valid pixels over the observable footprint (both rectified views carry
    data) — the denominator the reference's validity logic implies
    (``plugin.py:150-152``).
    """
    i, j = view_idx
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(
        scene.rpcs[i], scene.rpcs[j], *aoi_lonlat_ranges(scene),
        scene.images[i].shape, scene.images[j].shape,
    )
    product = pipe.process_pair(scene.images[i], scene.images[j], geom)
    valid = np.asarray(product.valid)
    truth, inb = truth_on_grid(scene, product.xyz)
    m = valid & inb
    if not m.any():
        return {"rmse_m": float("nan"), "bias_m": float("nan"),
                "completeness": 0.0, "valid_fraction": 0.0,
                "max_disp": geom and 0}
    err = np.asarray(product.height)[m] - truth[m]
    observable = (np.asarray(product.rect_left) >= 0) \
        & (np.asarray(product.rect_right) >= 0)
    return {
        "rmse_m": float(np.sqrt(np.mean(err ** 2))),
        "bias_m": float(np.mean(err)),
        "abs_p90_m": float(np.quantile(np.abs(err), 0.9)),
        "completeness": float(valid.sum() / max(observable.sum(), 1)),
        "valid_fraction": float(valid.mean()),
    }
