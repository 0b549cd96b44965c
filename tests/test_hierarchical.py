"""Coarse-to-fine matcher: quality parity with the full-search path."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.ops.stereo.hierarchical import (
    _resample_right_disp,
    _warp_right_by,
    compute_disparity_hierarchical,
)
from pcmi_tpu.pipelines.height_map import HeightMapPipeline


def test_warp_right_by_constant_shift(rng):
    img = rng.uniform(0, 1, (32, 64)).astype(np.float32)
    base = jnp.full((32, 64), 5.0)
    out = np.asarray(_warp_right_by(jnp.asarray(img), base, -16, 16))
    np.testing.assert_allclose(out[:, 8:56], img[:, 3:51], atol=1e-5)


def test_resample_right_disp_constant():
    disp = jnp.full((16, 64), 6.0)
    dr, got = _resample_right_disp(disp, -16, 16)
    got = np.asarray(got)
    # interior pixels should find their left counterpart with d == 6
    assert got[:, 8:50].all()
    np.testing.assert_allclose(np.asarray(dr)[:, 8:50], 6.0, atol=1e-5)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    h, w = 192, 224
    tex = rng.uniform(0, 1, (h, w + 96)).astype(np.float32)
    for ax in (0, 1):
        tex = 0.5 * tex + 0.25 * np.roll(tex, 1, ax) + 0.25 * np.roll(tex, -1, ax)
    disp = np.full((h, w), -6.0, np.float32)
    disp[60:130, 70:170] = 10.0
    left = tex[:, 48:48 + w]
    xs = np.arange(w)[None, :] + disp + 48
    x0 = np.floor(xs).astype(int)
    t = xs - x0
    rows = np.arange(h)[:, None]
    right = tex[rows, np.clip(x0, 0, tex.shape[1] - 1)] * (1 - t) + \
        tex[rows, np.clip(x0 + 1, 0, tex.shape[1] - 1)] * t
    return left, right.astype(np.float32), disp


def test_hierarchical_matches_full_search(pair):
    left, right, gt = pair
    cfg = StereoConfig(max_disp=48, block_size=9, census_window=5,
                       speckle_median_size=9, edge_dilation=4)
    v = jnp.ones(left.shape, bool)
    full = compute_disparity_hierarchical(
        jnp.asarray(left), jnp.asarray(right), v, v, cfg, local_disp=16)
    d = np.asarray(full.disparity)
    ok = np.asarray(full.valid)
    assert ok.mean() > 0.5
    err = np.abs(d - gt)
    interior = np.zeros_like(gt, bool)
    interior[8:-8, 24:-8] = True
    assert np.median(err[interior & ok]) < 0.35
    assert (err[interior & ok] < 1.0).mean() > 0.9


def test_hierarchical_pair_core_height_quality():
    """End-to-end gate with the hierarchical matcher swapped in."""
    scene = make_stereo_scene(seed=1, out_shape=(320, 320),
                              ground_shape=(448, 448), h_range=(0.0, 40.0),
                              views=((10.0, 80.0), (20.0, 250.0)))
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8,
                            hierarchical=True),
        rectify=RectifyConfig(height_range=(0.0, 40.0)),
    )
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(scene.rpcs[0], scene.rpcs[1],
                               *aoi_lonlat_ranges(scene),
                               scene.images[0].shape, scene.images[1].shape)
    product = pipe.process_pair(scene.images[0], scene.images[1], geom)
    valid = np.asarray(product.valid)
    assert valid.mean() > 0.08
    # truth comparison (same helper logic as test_pipeline)
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    gx = (np.asarray(product.xyz[..., 0]) - ox) / scene.ground_gsd
    gy = (np.asarray(product.xyz[..., 1]) - oy) / scene.ground_gsd
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) & (gy >= 0) & (gy < terr.shape[0] - 1)
    tt = terr[np.clip(gy.astype(int), 0, terr.shape[0] - 1),
              np.clip(gx.astype(int), 0, terr.shape[1] - 1)]
    m = valid & inb
    err = np.asarray(product.height)[m] - tt[m]
    rmse = float(np.sqrt(np.mean(err**2)))
    # hierarchical trades a little accuracy for ~5x less search work
    assert rmse < 1.5, f"hierarchical height RMSE {rmse:.3f} m"
    assert abs(float(np.median(err))) < 0.3