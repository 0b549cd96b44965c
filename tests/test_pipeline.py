"""End-to-end flagship pipeline on synthetic ground truth.

BASELINE.json configs 1-2: single pair → height map (parity / accuracy) and
multi-date stack → fused cloud + DSM. Height accuracy target: ≤ 1 m RMSE.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.pairs import ImageMeta, select_pairs, take_pairs
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.pipelines.height_map import (
    HeightMapExtractor,
    HeightMapPipeline,
    required_max_disp,
)
from pcmi_tpu.pipelines.multiday import MultiDayFusion


VIEWS3 = ((10.0, 80.0), (20.0, 250.0), (16.0, 170.0))


@pytest.fixture(scope="module")
def scene():
    return make_stereo_scene(
        seed=1, out_shape=(256, 256), ground_shape=(384, 384),
        h_range=(0.0, 40.0), views=VIEWS3,
    )


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8),
        rectify=RectifyConfig(height_range=(0.0, 40.0)),
    )


@pytest.fixture(scope="module")
def pair_run(scene, cfg):
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(
        scene.rpcs[0], scene.rpcs[1],
        *aoi_lonlat_ranges(scene),
        scene.images[0].shape, scene.images[1].shape,
    )
    product = pipe.process_pair(scene.images[0], scene.images[1], geom)
    return pipe, geom, product


def _truth_on_grid(scene, xyz):
    """Sample the true terrain height at each triangulated (x, y)."""
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
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) & (gy >= 0) & (gy < terr.shape[0] - 1)
    return t, inb


def test_required_max_disp_covers_range(scene, cfg):
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(
        scene.rpcs[0], scene.rpcs[1], *aoi_lonlat_ranges(scene),
        scene.images[0].shape, scene.images[1].shape,
    )
    md = required_max_disp([geom], (0.0, 40.0))
    assert md % 16 == 0
    # must cover the disparity the geometry can produce over the h range
    need = abs(geom.disp_gain) * max(abs(40.0 - geom.h_mid), abs(geom.h_mid))
    assert md / 2 >= need


def test_single_pair_height_rmse_under_1m(scene, pair_run):
    """BASELINE north-star accuracy gate: ≤ 1 m RMSE vs ground truth."""
    _, geom, product = pair_run
    valid = np.asarray(product.valid)
    assert valid.mean() > 0.10, "pipeline should keep a usable valid region"
    truth, inb = _truth_on_grid(scene, product.xyz)
    m = valid & inb
    err = np.asarray(product.height)[m] - truth[m]
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse < 1.0, f"height RMSE {rmse:.3f} m"
    # bias should also be small (geometry is exact for synthetic RPCs)
    assert abs(float(np.mean(err))) < 0.5


def test_single_pair_completeness(scene, pair_run):
    """Completeness gate: ≥ 50% of the observable canvas (both rectified
    footprints carry data) must yield a valid height — band recovery keeps
    the discontinuity bands from hollowing out the product (the reference
    densifies with its second WLS pass, ``disparity.py:129-155``)."""
    _, _, product = pair_run
    valid = np.asarray(product.valid)
    observable = (np.asarray(product.rect_left) >= 0) & (
        np.asarray(product.rect_right) >= 0
    )
    completeness = valid.sum() / max(observable.sum(), 1)
    assert completeness >= 0.5, f"completeness {completeness:.3f}"


def test_pair_product_masks_and_photo(scene, pair_run):
    _, _, product = pair_run
    valid = np.asarray(product.valid)
    photo = np.asarray(product.photo)
    # photoconsistency must be small where the match is valid
    assert float(np.median(photo[valid])) < 0.1
    # heights are NaN exactly off the valid mask
    assert np.isnan(np.asarray(product.height)[~valid]).all()


def test_plugin_layer_contract(scene, cfg):
    plugin = HeightMapExtractor(HeightMapPipeline(cfg))
    plugin.set_sources(scene.images, scene.rpcs, *aoi_lonlat_ranges(scene))
    layers = plugin.run(pair=(0, 1))
    kinds = [k for _, _, k in layers]
    assert kinds[:3] == ["image", "image", "image"]
    assert kinds[-1] == "points"
    names = [p.get("name") for _, p, _ in layers]
    assert any(n.startswith("disparity") for n in names)
    assert any(n.startswith("photoconsistency") for n in names)
    pts = layers[-1][0]
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 1000


def test_plugin_selection_modes(scene, cfg):
    """Reference widget modes (plugin.py:63-70): first-N via metas, random."""
    plugin = HeightMapExtractor(HeightMapPipeline(cfg))
    plugin.set_sources(scene.images, scene.rpcs, *aoi_lonlat_ranges(scene))
    metas = [ImageMeta(i, inc, az, date=30.0 * i)
             for i, (inc, az) in enumerate(VIEWS3)]
    products = []
    orig_process = plugin.pipeline.process_pair

    def spy(*a, **k):
        products.append(orig_process(*a, **k))
        return products[-1]

    plugin.pipeline.process_pair = spy
    layers = plugin.run(metas=metas, mode="first", n=2)
    names = [p.get("name") for _, p, _ in layers]
    # two pairs -> two disparity layers with distinct tags
    disp_names = [n for n in names if n.startswith("disparity")]
    assert len(disp_names) == 2 and len(set(disp_names)) == 2
    # random mode exercises run()'s selection + layer plumbing; the matcher
    # itself is identical code to the first-N leg above, so reuse a recorded
    # product instead of paying a third full pair-core execution (~15 s)
    plugin.pipeline.process_pair = lambda *a, **k: products[0]
    layers_r = plugin.run(metas=metas, mode="random", n=3, seed=1)
    assert sum(n.startswith("disparity")
               for n in (p.get("name") for _, p, _ in layers_r)) == 1


def test_pair_selection_on_metas():
    metas = [
        ImageMeta(0, 10.0, 80.0, date=0.0),
        ImageMeta(1, 20.0, 250.0, date=30.0),
        ImageMeta(2, 45.0, 170.0, date=60.0),   # incidence too steep
        ImageMeta(3, 10.5, 82.0, date=90.0),    # nearly same view as 0
    ]
    pairs = select_pairs(metas)
    valid = [p for p in pairs if p.valid]
    # pair (0,3) has ~0.6 deg convergence -> invalid; any pair with 2 -> invalid
    assert all(2 not in (p.i, p.j) for p in valid)
    assert all({p.i, p.j} != {0, 3} for p in valid)
    top = take_pairs(pairs, 2)
    assert len(top) >= 1 and top[0].valid


def test_multiday_fusion_dsm_accuracy(scene, cfg):
    metas = [
        ImageMeta(i, inc, az, date=30.0 * i)
        for i, (inc, az) in enumerate(VIEWS3)
    ]
    fusion = MultiDayFusion(
        cfg.replace(pairs=dataclasses.replace(cfg.pairs, n_pairs=3))
    )
    fused = fusion.run(
        scene.images, scene.rpcs, metas, *aoi_lonlat_ranges(scene),
        points_per_pair=1 << 15, with_kmeans=True, grid_cell=2.0,
    )
    assert fused.kmeans_centroids is not None
    # registration residuals should be small (same frame, exact geometry)
    assert float(np.max(np.asarray(fused.icp_rmse))) < 2.0

    # DSM vs truth where cells are filled. Two-part evaluation:
    # (a) distance to the truth INTERVAL (min..max of the true surface over
    #     the cell footprint) everywhere — a 2 m cell straddling a building
    #     wall legitimately contains both the roof and the ground height, so
    #     point-sampled truth is ill-defined there;
    # (b) plain cell-centre truth on flat cells (|∇truth| ≤ 2 m/m).
    dsm = np.asarray(fused.dsm)
    ny, nx = dsm.shape
    x0, y0 = fused.grid_origin
    cxs = x0 + (np.arange(nx) + 0.5) * fused.grid_cell
    cys = y0 + (np.arange(ny) + 0.5) * fused.grid_cell
    cx, cy = np.meshgrid(cxs, cys)
    fake_xyz = np.stack([cx, cy, np.zeros_like(cx)], axis=-1)
    truth, inb = _truth_on_grid(scene, jnp.asarray(fake_xyz))
    m = np.isfinite(dsm) & inb
    assert m.mean() > 0.3

    # per-cell truth interval from the native-resolution terrain samples
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    ty_idx, tx_idx = np.mgrid[0: terr.shape[0], 0: terr.shape[1]]
    wx = ox + tx_idx * scene.ground_gsd
    wy = oy + ty_idx * scene.ground_gsd
    cgx = np.floor((wx - x0) / fused.grid_cell).astype(int)
    cgy = np.floor((wy - y0) / fused.grid_cell).astype(int)
    ok = (cgx >= 0) & (cgx < nx) & (cgy >= 0) & (cgy < ny)
    tmin = np.full_like(dsm, np.inf)
    tmax = np.full_like(dsm, -np.inf)
    np.minimum.at(tmin, (cgy[ok], cgx[ok]), terr[ok])
    np.maximum.at(tmax, (cgy[ok], cgx[ok]), terr[ok])
    mi = m & np.isfinite(tmin) & np.isfinite(tmax)
    dist = np.where(dsm < tmin, tmin - dsm,
                    np.where(dsm > tmax, dsm - tmax, 0.0))[mi]
    rmse_interval = float(np.sqrt(np.mean(dist**2)))
    assert rmse_interval < 1.0, f"fused DSM interval RMSE {rmse_interval:.3f} m"

    gyt, gxt = np.gradient(truth)
    flat = m & (np.hypot(gyt, gxt) <= 2.0)
    err = dsm[flat] - truth[flat]
    rmse_flat = float(np.sqrt(np.mean(err**2)))
    assert rmse_flat < 0.75, f"fused DSM flat-cell RMSE {rmse_flat:.3f} m"
