"""Geometry layer tests: RPC model, affine fit, rectification, triangulation.

These validate the GDAL/ASP replacement (SURVEY §2.3) against exact
synthetic ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.geometry.rpc import RPCCamera, make_affine_rpc
from pcmi_tpu.geometry.affine import (
    LocalFrame,
    fit_affine_camera,
    affine_fit_residual,
    probe_grid,
)
from pcmi_tpu.geometry.rectify import (
    build_geometry_from_rpcs,
    fit_affine_fundamental,
    rectify_images,
    triangulate_disparity,
)
from pcmi_tpu.geometry.synthetic import (
    make_stereo_scene,
    make_satellite_camera,
    rpc_from_affine_camera,
    view_vector,
    aoi_lonlat_ranges,
)


@pytest.fixture(scope="module")
def scene():
    return make_stereo_scene(seed=0, out_shape=(384, 384), ground_shape=(512, 512))


def test_view_vector_matches_reference_convention():
    # nadir
    np.testing.assert_allclose(view_vector(0, 0), [0, 0, 1], atol=1e-12)
    # east-looking 30 deg off-nadir: az=90 -> x=sin(30), y=0
    v = view_vector(30, 90)
    np.testing.assert_allclose(v, [0.5, 0, np.sqrt(3) / 2], atol=1e-12)


def test_rpc_roundtrip_affine():
    rpc = make_affine_rpc(
        np.array([0.1, 1.0, 0.2, 0.05]), np.array([-0.1, 0.1, 1.0, 0.1])
    )
    lon = jnp.asarray([-58.58, -58.585, -58.575])
    lat = jnp.asarray([-34.49, -34.495, -34.488])
    h = jnp.asarray([5.0, 25.0, 45.0])
    col, row = rpc.project(lon, lat, h)
    lon2, lat2 = rpc.localize(col, row, h)
    np.testing.assert_allclose(np.asarray(lon2), np.asarray(lon), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat2), np.asarray(lat), atol=1e-5)


def test_affine_camera_fit_is_exact_for_affine_rpc(scene):
    frame = scene.frame
    (lon_r, lat_r) = aoi_lonlat_ranges(scene)[0], aoi_lonlat_ranges(scene)[1]
    llh = probe_grid(lon_r, lat_r, scene.h_range, (6, 6, 4))
    cam = fit_affine_camera(scene.rpcs[0], frame, llh)
    resid = affine_fit_residual(scene.rpcs[0], frame, cam, llh)
    assert resid < 0.05  # sub-pixel: the synthetic RPC is exactly affine


def test_affine_fundamental_on_probes(scene):
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    llh = probe_grid(lon_r, lat_r, scene.h_range, (6, 6, 4))
    x, y, z = scene.frame.to_local(
        jnp.asarray(llh[:, 0]), jnp.asarray(llh[:, 1]), jnp.asarray(llh[:, 2])
    )
    P = jnp.stack([x, y, z], axis=1)
    p1 = np.asarray(scene.cameras[0].project(P))
    p2 = np.asarray(scene.cameras[1].project(P))
    f = fit_affine_fundamental(p1, p2)
    resid = np.abs(
        f[0] * p2[:, 0] + f[1] * p2[:, 1] + f[2] * p1[:, 0] + f[3] * p1[:, 1] + f[4]
    )
    assert resid.max() < 1e-2


def test_rectification_aligns_epipolar_rows(scene):
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    geom = build_geometry_from_rpcs(
        scene.rpcs[0], scene.rpcs[1], lon_r, lat_r, scene.h_range,
        scene.images[0].shape, scene.images[1].shape, pad_multiple=64,
    )
    assert geom.epipolar_residual < 0.1
    # corresponding 3D points land on the same rectified row
    lon_rr, lat_rr = aoi_lonlat_ranges(scene)
    llh = probe_grid(lon_rr, lat_rr, scene.h_range, (5, 5, 3))
    x, y, z = scene.frame.to_local(
        jnp.asarray(llh[:, 0]), jnp.asarray(llh[:, 1]), jnp.asarray(llh[:, 2])
    )
    P = jnp.stack([x, y, z], axis=1)
    r1 = np.asarray(geom.cam1_rect.project(P))
    r2 = np.asarray(geom.cam2_rect.project(P))
    assert np.abs(r1[:, 1] - r2[:, 1]).max() < 0.1


def test_triangulation_recovers_probe_heights(scene):
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    geom = build_geometry_from_rpcs(
        scene.rpcs[0], scene.rpcs[1], lon_r, lat_r, scene.h_range,
        scene.images[0].shape, scene.images[1].shape, pad_multiple=64,
    )
    llh = probe_grid(lon_r, lat_r, scene.h_range, (5, 5, 4))
    x, y, z = scene.frame.to_local(
        jnp.asarray(llh[:, 0]), jnp.asarray(llh[:, 1]), jnp.asarray(llh[:, 2])
    )
    P = jnp.stack([x, y, z], axis=1)
    r1 = np.asarray(geom.cam1_rect.project(P))
    r2 = np.asarray(geom.cam2_rect.project(P))

    # build a sparse disparity image holding the probe disparities
    H, W = geom.out_shape
    from pcmi_tpu.geometry.rectify import triangulation_operator

    M, b = triangulation_operator(geom)
    obs = np.stack([r1[:, 0], r1[:, 1], r2[:, 0], r2[:, 1]], axis=1)
    xyz = (obs - np.asarray(b)) @ np.asarray(M).T
    np.testing.assert_allclose(xyz[:, 2], np.asarray(z), atol=0.05)


def test_rectified_images_have_horizontal_correspondence(scene):
    """Photometric check: NCC of corresponding rows should beat shifted rows."""
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    geom = build_geometry_from_rpcs(
        scene.rpcs[0], scene.rpcs[1], lon_r, lat_r, scene.h_range,
        scene.images[0].shape, scene.images[1].shape, pad_multiple=64,
    )
    r1, r2 = rectify_images(geom, scene.images[0], scene.images[1])
    r1 = np.asarray(r1)
    r2 = np.asarray(r2)
    v = (r1 >= 0) & (r2 >= 0)
    # both rectified views overlap substantially
    assert v.mean() > 0.2
