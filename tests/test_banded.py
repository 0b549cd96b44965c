"""Per-row-band adaptive disparity range (ops.stereo.banded)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.ops.stereo.banded import (
    band_centers,
    compose_global,
    field_offsets,
    pool_masked,
    shift_rows,
)
from pcmi_tpu.pipelines.evaluation import evaluate_pair_accuracy


def test_pool_masked_mean_and_majority(rng):
    img = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    mask = np.ones((16, 16), bool)
    mask[:, 8:] = False  # right half invalid
    val, ok = pool_masked(jnp.asarray(img), jnp.asarray(mask), 4)
    assert val.shape == (4, 4)
    np.testing.assert_allclose(
        np.asarray(val)[:, :2],
        img[:, :8].reshape(4, 4, 2, 4).mean(axis=(1, 3)), rtol=1e-6)
    got = np.asarray(ok)
    assert got[:, :2].all() and not got[:, 2:].any()


def test_shift_rows_matches_per_row_roll(rng):
    img = rng.uniform(0, 1, (8, 32)).astype(np.float32)
    shifts = np.array([-3, -1, 0, 1, 2, 5, -5, 4], np.int32)
    out = np.asarray(shift_rows(jnp.asarray(img), jnp.asarray(shifts),
                                pad=8, fill=0.0))
    for y, s in enumerate(shifts):
        # out(y, x) = img(y, x - s)
        xs = np.arange(32) - s
        ok = (xs >= 0) & (xs < 32)
        np.testing.assert_allclose(out[y, ok], img[y, xs[ok]], atol=1e-6)
        np.testing.assert_allclose(out[y, ~ok], 0.0)
    # 2D per-pixel shifts agree with the per-row path on row-constant input
    s2 = np.tile(shifts[:, None], (1, 32))
    out2 = np.asarray(shift_rows(jnp.asarray(img), jnp.asarray(s2),
                                 pad=8, fill=0.0))
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_band_centers_coverage_plateau():
    rng = np.random.default_rng(0)
    # band 0: bimodal 90% at 10 / 10% at 40. A wide window (half=40,
    # margin 8 -> effective ±32) covers BOTH modes for any offset in
    # [8, 42]; the plateau centre lands midway (~25).
    disp = np.full((16, 64), 10.0, np.float32)
    disp[rng.uniform(size=(16, 64)) < 0.10] = 40.0
    # band 1: constant -20 with 10% blunders at +100 — mass-based offsets
    # must ignore the tail (quantile-interval midpoints would not)
    disp2 = np.full((16, 64), -20.0, np.float32)
    disp2[rng.uniform(size=(16, 64)) < 0.10] = 100.0
    both = np.concatenate([disp, disp2], axis=0)
    valid = np.ones_like(both, bool)
    centers, counts = band_centers(jnp.asarray(both), jnp.asarray(valid),
                                   n_tiles_y=2, d_min=-144, d_max=144,
                                   half=40.0)
    c = np.asarray(centers)
    assert c.shape == (2, 1)
    assert abs(c[0, 0] - 25.0) < 5.0
    assert abs(c[1, 0] - (-20.0)) < 5.0
    np.testing.assert_allclose(np.asarray(counts)[:, 0], [16 * 64, 16 * 64])
    # a NARROW window cannot cover both modes: majority mass wins band 0
    centers_n, _ = band_centers(jnp.asarray(both), jnp.asarray(valid),
                                n_tiles_y=2, d_min=-144, d_max=144,
                                half=16.0)
    assert abs(np.asarray(centers_n)[0, 0] - 10.0) < 6.0


def test_band_centers_2d_tiles():
    # 2x2 tile grid with distinct levels; x-variation is what row bands
    # cannot express
    disp = np.zeros((16, 16), np.float32)
    disp[:8, :8] = -30.0
    disp[:8, 8:] = 42.0
    disp[8:, :8] = 10.0
    disp[8:, 8:] = -5.0
    valid = np.ones((16, 16), bool)
    centers, _ = band_centers(jnp.asarray(disp), jnp.asarray(valid),
                              n_tiles_y=2, d_min=-64, d_max=64, half=20.0,
                              n_tiles_x=2, min_count=16)
    c = np.asarray(centers)
    np.testing.assert_allclose(c, [[-30, 42], [10, -5]], atol=3.0)


def test_band_centers_empty_band_falls_back_to_global():
    disp = np.full((32, 32), 12.0, np.float32)
    valid = np.ones((32, 32), bool)
    valid[16:] = False  # band 1 empty
    centers, _ = band_centers(jnp.asarray(disp), jnp.asarray(valid),
                              n_tiles_y=2, d_min=-64, d_max=64, half=24.0)
    c = np.asarray(centers)
    assert abs(c[0, 0] - 12.0) < 3.0
    assert abs(c[1, 0] - c[0, 0]) < 1e-5


def test_field_offsets_bilinear_and_clamp():
    centers = jnp.asarray([[0.0, 8.0], [32.0, 40.0]])
    o = np.asarray(field_offsets(centers, tile_rows=8, tile_cols=8,
                                 height=16, width=16,
                                 o_min=-100.0, o_max=36.0))
    assert o.shape == (16, 16)
    assert o[0, 0] == 0 and o[4, 4] == 0     # flat before first centres
    assert o[8, 4] == 16                      # y-midpoint, x at col centre
    assert o[4, 8] == 4                       # x-midpoint of top tiles
    assert o[12, 12] == 36                    # clamped at o_max (was 40)
    # smooth: neighbouring offsets differ by small steps
    assert np.abs(np.diff(o, axis=0)).max() <= 4
    assert np.abs(np.diff(o, axis=1)).max() <= 2


def test_compose_global_interpolates_offsets():
    # o(y, x) = x (a ramp, chunk=1); dl = 2 everywhere
    # global = dl + o(y, x - dl) = 2 + (x - 2) = x
    o = np.tile(np.arange(16, dtype=np.int32)[None, :], (4, 1))
    dl = jnp.full((4, 16), 2.0)
    g = np.asarray(compose_global(dl, jnp.asarray(o), chunk=1,
                                  d_min=-4, d_max=4))
    np.testing.assert_allclose(g[:, 2:], np.tile(np.arange(16)[None, 2:],
                                                 (4, 1)), atol=1e-5)
    # constant offsets: exact composition everywhere, fractional dl ok
    o2 = jnp.full((4, 16), 7, jnp.int32)
    dl2 = jnp.full((4, 16), -3.25)
    g2 = np.asarray(compose_global(dl2, o2, chunk=1, d_min=-4, d_max=4))
    np.testing.assert_allclose(g2, 7.0 - 3.25, atol=1e-5)
    # chunked offsets expand to the pixel grid before lookup
    o3 = jnp.asarray([[2, 6]], jnp.int32)           # (1, 2) chunks of 8
    dl3 = jnp.zeros((1, 16))
    g3 = np.asarray(compose_global(dl3, o3, chunk=8, d_min=-4, d_max=4))
    np.testing.assert_allclose(g3[0, :8], 2.0, atol=1e-5)
    np.testing.assert_allclose(g3[0, 9:], 6.0, atol=1e-5)
    # row-constant (nc == 1): exact direct add
    o4 = jnp.asarray([[5]], jnp.int32)
    g4 = np.asarray(compose_global(jnp.full((1, 16), 1.5), o4, chunk=16,
                                   d_min=-4, d_max=4))
    np.testing.assert_allclose(g4, 6.5, atol=1e-5)


@pytest.fixture(scope="module")
def steep_scene():
    # steep-convergence fine-GSD scene: the MAX_DISP=288-style envelope
    # shrunk to test scale — required_max_disp lands at 160 px here
    return make_stereo_scene(
        seed=3, out_shape=(384, 384), ground_shape=(416, 416), gsd=0.25,
        h_range=(0.0, 40.0), views=((25.0, 80.0), (35.0, 250.0)),
        terrain_kwargs=dict(terrain_fraction=0.6, building_size_px=(40, 90),
                            building_h_m=(8.0, 16.0)),
    )


def _cfg(h_range, **stereo_kw):
    return PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5,
                            margin_undefined=8, **stereo_kw),
        rectify=RectifyConfig(height_range=h_range),
    )


# Full-envelope search on steep_scene, measured once on the 8-device CPU
# mesh (r5; deterministic: fixed seed, no dropout). Pinned rather than
# recomputed each run — the live comparator cost ~24 s of suite wall time
# and tested code the other gates already cover. Re-measure with
# evaluate_pair_accuracy(steep_scene, _cfg((0.0, 40.0))) if the matcher,
# rectifier, or scene generator changes.
FULL_SEARCH_RMSE_M = 0.9285
FULL_SEARCH_COMPLETENESS = 0.6429


def test_banded_end_to_end_matches_full_search(steep_scene):
    """The tile-adaptive matcher must hold the quality gates while
    searching a fraction of the envelope.

    Measured trade on this steep scene: the narrow windows EXCLUDE the
    far-off blunder matches the full search confidently admits — RMSE
    drops ~0.93 -> ~0.60 m while completeness gives up a few points of
    (largely wrong) matches. The gates pin both sides of that trade
    against the pinned full-search reference above.
    """
    h_range = (0.0, 40.0)
    banded = evaluate_pair_accuracy(
        steep_scene,
        _cfg(h_range, adapt_band_rows=32, adapt_local_disp=96))
    assert banded["rmse_m"] <= 1.0, banded
    assert banded["rmse_m"] <= FULL_SEARCH_RMSE_M - 0.1, banded
    assert banded["completeness"] >= 0.5, banded
    assert banded["completeness"] >= FULL_SEARCH_COMPLETENESS - 0.08, banded
    assert abs(banded["bias_m"]) < 0.3


def test_banded_window_coverage(steep_scene):
    """The coarse-guided windows must cover essentially all the scene's
    true structure (the diagnostic bench.py reports as in_window)."""
    import jax

    from pcmi_tpu.geometry.rectify import rectify_arrays
    from pcmi_tpu.ops.normalize import normalise_image
    from pcmi_tpu.ops.stereo.banded import window_coverage
    from pcmi_tpu.pipelines.height_map import HeightMapPipeline

    scene = steep_scene
    cfgp = _cfg((0.0, 40.0), adapt_band_rows=32, adapt_local_disp=96)
    pipe = HeightMapPipeline(cfgp)
    geom = pipe.build_geometry(scene.rpcs[0], scene.rpcs[1],
                               *aoi_lonlat_ranges(scene),
                               scene.images[0].shape, scene.images[1].shape)
    scfg = pipe.stereo_cfg_for([geom])
    assert scfg.max_disp >= 2 * scfg.adapt_local_disp, scfg.max_disp
    r1, r2 = rectify_arrays(
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[1]),
        jnp.asarray(geom.H1, jnp.float32), jnp.asarray(geom.H2, jnp.float32),
        geom.out_shape)
    m1, m2 = r1 >= 0, r2 >= 0
    n1, _ = normalise_image(r1, m1)
    n2, _ = normalise_image(r2, m2)
    cov = float(jax.jit(window_coverage, static_argnames="cfg")(
        n1, n2, m1, m2, cfg=scfg))
    assert cov > 0.98, cov


def test_banded_config_validation():
    with pytest.raises(ValueError):
        StereoConfig(adapt_band_rows=32, adapt_local_disp=40)  # not /16
    with pytest.raises(ValueError):
        StereoConfig(adapt_band_rows=32, adapt_local_disp=320)  # > envelope
    with pytest.raises(ValueError):
        StereoConfig(adapt_band_rows=30, adapt_coarse_scale=4)  # not /scale
    with pytest.raises(ValueError):
        StereoConfig(adapt_band_rows=32, adapt_band_cols=30)   # not /scale
    with pytest.raises(ValueError):
        StereoConfig(adapt_band_rows=32, hierarchical=True)
    cfg = StereoConfig(max_disp=288, adapt_band_rows=32, adapt_local_disp=96,
                       disp_stride=2)
    assert cfg.adapt_local_disp == 96 and cfg.adapt_band_cols == 64
