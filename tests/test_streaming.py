"""Streaming tiled-AOI pipeline vs the monolithic path (seam parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.pairs import ImageMeta
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.pipelines.streaming import StreamingAOIPipeline, StreamingDSM, dsm_update, dsm_finalize
from pcmi_tpu.pipelines.height_map import HeightMapPipeline
from pcmi_tpu.ops.pointcloud import grid_fuse


VIEWS = ((10.0, 80.0), (20.0, 250.0))


@pytest.fixture(scope="module")
def scene():
    return make_stereo_scene(seed=1, out_shape=(256, 256), ground_shape=(384, 384),
                             h_range=(0.0, 40.0), views=VIEWS)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8),
        rectify=RectifyConfig(height_range=(0.0, 40.0)),
    )


def test_dsm_accumulator_matches_grid_fuse(rng):
    xy = rng.uniform(0, 10, (500, 2)).astype(np.float32)
    v = rng.normal(size=500).astype(np.float32)
    w = np.ones(500, np.float32)
    acc = StreamingDSM(wsum=jnp.zeros((10, 10)), vsum=jnp.zeros((10, 10)),
                       vsq=jnp.zeros((10, 10)))
    # two chunks streamed
    acc = dsm_update(acc, jnp.asarray(xy[:250]), jnp.asarray(v[:250]),
                     jnp.asarray(w[:250]), (0.0, 0.0), 1.0, (10, 10))
    acc = dsm_update(acc, jnp.asarray(xy[250:]), jnp.asarray(v[250:]),
                     jnp.asarray(w[250:]), (0.0, 0.0), 1.0, (10, 10))
    dsm, count = dsm_finalize(acc)
    ref, ref_cnt = grid_fuse(jnp.asarray(xy), jnp.asarray(v), jnp.asarray(w),
                             (0.0, 0.0), 1.0, (10, 10), robust_sigma=1e9)
    m = np.isfinite(dsm)
    np.testing.assert_allclose(dsm[m], np.asarray(ref)[m], atol=1e-4)
    np.testing.assert_allclose(count, np.asarray(ref_cnt), atol=1e-4)


def test_streaming_matches_monolithic(scene, cfg):
    metas = [ImageMeta(i, inc, az, date=30.0 * i)
             for i, (inc, az) in enumerate(VIEWS)]
    lon_r, lat_r = aoi_lonlat_ranges(scene)

    stream = StreamingAOIPipeline(cfg, band_rows=128)
    out = stream.run(scene.images, scene.rpcs, metas, lon_r, lat_r,
                     grid_cell=2.0, n_pairs=1)
    assert out["tiles"] >= 3  # actually streamed multiple bands

    # monolithic reference: same pair, full canvas, same grid
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(scene.rpcs[0], scene.rpcs[1], lon_r, lat_r,
                               scene.images[0].shape, scene.images[1].shape)
    prod = pipe.process_pair(scene.images[0], scene.images[1], geom)
    xyz = np.asarray(prod.xyz)
    valid = np.asarray(prod.valid)
    ref, _ = grid_fuse(
        jnp.asarray(xyz[..., :2].reshape(-1, 2)),
        jnp.asarray(xyz[..., 2].reshape(-1)),
        jnp.asarray(valid.reshape(-1).astype(np.float32)),
        out["origin"], out["cell"],
        out["dsm"].shape, robust_sigma=1e9,
    )
    ref = np.asarray(ref)
    dsm = out["dsm"]
    both = np.isfinite(dsm) & np.isfinite(ref)
    # the auto grid spans the full rectified quad, so absolute coverage is
    # low; what matters is that the covered cells agree across band seams
    assert both.sum() > 500
    diff = np.abs(dsm[both] - ref[both])
    # band seams may differ slightly (halo truncation of SGM/median context)
    assert np.median(diff) < 0.05
    assert (diff < 0.5).mean() > 0.9


def test_dsm_finalize_multi_mad_mask():
    """mad_max masks cells where the acquisitions disagree; consensus
    cells keep the median (the lowtex-fusion consistency gate)."""
    import jax.numpy as jnp

    from pcmi_tpu.pipelines.streaming import StreamingDSM, dsm_finalize_multi

    def acc_of(vals):
        v = jnp.asarray(vals, jnp.float32)
        w = jnp.where(jnp.isnan(v), 0.0, 1.0)
        v = jnp.nan_to_num(v)
        return StreamingDSM(wsum=w, vsum=v * w, vsq=v * v * w)

    # 3 pairs over a 1x4 grid:
    # cell 0: consensus (10, 10.2, 9.9)      -> kept, median ~10
    # cell 1: one blunder (5, 5.1, 25)       -> kept (MAD from median small)
    # cell 2: disagreement (0, 8, 16)        -> masked by mad_max
    # cell 3: single pair only               -> masked by min_pairs
    accs = [acc_of([[10.0, 5.0, 0.0, 7.0]]),
            acc_of([[10.2, 5.1, 8.0, np.nan]]),
            acc_of([[9.9, 25.0, 16.0, np.nan]])]
    dsm, cnt, npair = dsm_finalize_multi(accs, min_pairs=2, mad_max=1.0)
    assert abs(dsm[0, 0] - 10.0) < 0.21
    assert abs(dsm[0, 1] - 5.1) < 1e-5         # median robust to 1-of-3
    assert np.isnan(dsm[0, 2])                  # cross-pair MAD 8 > 1
    assert np.isnan(dsm[0, 3])                  # redundancy gate
    np.testing.assert_array_equal(npair[0], [3, 3, 3, 1])


def test_finalize_accept2():
    """accept2_delta re-admits two-acquisition cells only when the two
    pair means agree within it (the d288 footprint-margin recovery)."""
    import jax.numpy as jnp

    from pcmi_tpu.pipelines.streaming import StreamingDSM, dsm_finalize_multi

    def acc_of(vals):
        v = jnp.asarray(vals, jnp.float32)
        w = jnp.where(jnp.isnan(v), 0.0, 1.0)
        v = jnp.nan_to_num(v)
        return StreamingDSM(wsum=w, vsum=v * w, vsq=v * v * w)

    # 4 pairs over a 1x4 grid:
    # cell 0: 3 pairs consensus            -> median path (unchanged)
    # cell 1: 2 pairs agreeing (7.0, 7.3)  -> accepted, mean 7.15
    # cell 2: 2 pairs disagreeing (4, 9)   -> stays NaN
    # cell 3: 1 pair                       -> stays NaN
    accs = [acc_of([[10.0, 7.0, 4.0, 2.0]]),
            acc_of([[10.2, 7.3, 9.0, np.nan]]),
            acc_of([[9.9, np.nan, np.nan, np.nan]])]
    dsm, _cnt, npair = dsm_finalize_multi(accs, min_pairs=3,
                                          accept2_delta=0.7)
    assert abs(dsm[0, 0] - 10.0) < 0.21
    assert abs(dsm[0, 1] - 7.15) < 1e-5
    assert np.isnan(dsm[0, 2])
    assert np.isnan(dsm[0, 3])
    np.testing.assert_array_equal(npair[0], [3, 2, 2, 1])
    # without the flag, the n==2 cell is masked by min_pairs
    dsm0, _, _ = dsm_finalize_multi(accs, min_pairs=3)
    assert np.isnan(dsm0[0, 1])


def test_pair_observability_geometry():
    """Geometric observability: bbox corners outside every footprint count
    as unobservable; every rectified-data cell is observable (obs >= 1 is a
    superset of what any matcher can fill)."""
    import itertools

    from pcmi_tpu.geometry.synthetic import make_stereo_scene
    from pcmi_tpu.pipelines.evaluation import pair_observability

    scene = make_stereo_scene(seed=5, out_shape=(256, 256),
                              ground_shape=(320, 320), gsd=0.5,
                              h_range=(0.0, 20.0),
                              views=((25.0, 80.0), (35.0, 250.0),
                                     (30.0, 160.0)))
    pairs = list(itertools.combinations(range(3), 2))
    cell = 1.0
    hg, wg = scene.terrain.shape
    ny = int(hg * scene.ground_gsd / cell)
    nx = int(wg * scene.ground_gsd / cell)
    obs = pair_observability(scene, pairs, cell, (ny, nx))
    assert obs.shape == (ny, nx)
    assert obs.max() <= len(pairs) and obs.min() >= 0
    frac1 = float((obs >= 1).mean())
    # the oblique views' footprints never cover the whole ground bbox,
    # but do cover most of it
    assert 0.5 < frac1 < 1.0
