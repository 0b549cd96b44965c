"""Stage cache semantics + pipeline resume + multi-AOI sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.pairs import ImageMeta
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.pipelines.height_map import HeightMapPipeline
from pcmi_tpu.pipelines.sweep import AOISpec, MultiAOISweep
from pcmi_tpu.utils.cache import StageCache


def test_stage_cache_hit_miss_semantics(tmp_path, rng):
    cache = StageCache(str(tmp_path / "c"))
    a = rng.normal(size=(16, 16)).astype(np.float32)
    calls = []

    def compute():
        calls.append(1)
        return {"y": a * 2}

    r1 = cache.get_or_compute("stage", ("cfg", a), compute)
    r2 = cache.get_or_compute("stage", ("cfg", a), compute)
    np.testing.assert_array_equal(r1["y"], r2["y"])
    assert len(calls) == 1 and cache.hits == 1 and cache.misses == 1
    # content change -> miss
    cache.get_or_compute("stage", ("cfg", a + 1), compute)
    assert len(calls) == 2
    # config change -> miss
    cache.get_or_compute("stage", ("cfg2", a), compute)
    assert len(calls) == 3
    # different stage name -> different key
    assert StageCache.digest("s1", a) != StageCache.digest("s2", a)


@pytest.fixture(scope="module")
def small_scene():
    return make_stereo_scene(seed=2, out_shape=(256, 256), ground_shape=(384, 384),
                             h_range=(0.0, 30.0),
                             views=((10.0, 80.0), (20.0, 250.0)))


@pytest.fixture(scope="module")
def small_cfg():
    return PipelineConfig(
        stereo=StereoConfig(block_size=7, census_window=5, margin_undefined=6,
                            edge_dilation=4),
        rectify=RectifyConfig(height_range=(0.0, 30.0)),
    )


def test_pipeline_cache_resume(tmp_path, small_scene, small_cfg):
    scene = small_scene
    pipe = HeightMapPipeline(small_cfg)
    geom = pipe.build_geometry(scene.rpcs[0], scene.rpcs[1],
                               *aoi_lonlat_ranges(scene),
                               scene.images[0].shape, scene.images[1].shape)
    cache = StageCache(str(tmp_path / "stage"))
    p1 = pipe.process_pair(scene.images[0], scene.images[1], geom, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    p2 = pipe.process_pair(scene.images[0], scene.images[1], geom, cache=cache)
    assert cache.hits == 1
    np.testing.assert_array_equal(np.asarray(p1.disparity), np.asarray(p2.disparity))
    np.testing.assert_array_equal(np.asarray(p1.valid), np.asarray(p2.valid))


def test_multi_aoi_sweep(small_scene, small_cfg):
    scene = small_scene
    metas = [ImageMeta(0, 10.0, 80.0, date=0.0), ImageMeta(1, 20.0, 250.0, date=30.0)]
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    aois = [
        AOISpec("site_a", scene.images, scene.rpcs, metas, lon_r, lat_r),
        AOISpec("site_b", scene.images, scene.rpcs, metas, lon_r, lat_r),
    ]
    sweep = MultiAOISweep(small_cfg)
    res = sweep.run(aois, points_per_pair=1 << 14, grid_cell=2.0,
                    with_kmeans=False)
    assert set(res.fused) == {"site_a", "site_b"}
    for name, st in res.stats.items():
        assert st["points"] > 1000
        assert st["dsm_filled"] > 0.05
    from pcmi_tpu.utils import stats
    assert any(k.startswith("aoi:") for k in stats())
