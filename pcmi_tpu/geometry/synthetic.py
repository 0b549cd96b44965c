"""Synthetic WV3-like stereo scene generator with exact ground truth.

The reference validates visually against real WV3 NTFs that are not shipped
(Git-LFS) and pins one "decent" pair (``constants.py:29-33``). This module
replaces that with *synthesised* multi-date scenes: a procedural terrain +
texture is imaged through satellite-style affine cameras (and their exact
RPC wrappers), so every pipeline stage has a known-truth target — the test
strategy the reference's ``test_stich.py:14-54`` gestures at (synthesise a
known warp, recover it), applied to the full 3D problem.

Conventions: local metric frame (east, north, up) in metres anchored at the
reference's San Fernando target site (``constants.py:22-23``); ground
sampling distance defaults to 0.5 m (WV3 PAN class).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pcmi_tpu.geometry.affine import AffineCamera, LocalFrame, M_PER_DEG_LAT, M_PER_DEG_LON_EQ
from pcmi_tpu.geometry.rpc import RPCCamera, make_affine_rpc
from pcmi_tpu.ops.warp import map_coordinates
from pcmi_tpu.ops.filters import gaussian_filter

TARGET_LAT = -34.490278   # ref constants.py:22
TARGET_LON = -58.584444   # ref constants.py:23


# single implementation of the ENU view-vector convention: pair selection,
# NITF metadata and scene synthesis must agree on it by construction
from pcmi_tpu.geometry.pairs import view_vector_np as view_vector  # noqa: E402


def make_satellite_camera(
    incidence_deg: float, azimuth_deg: float, gsd: float = 0.5,
    offset=(0.0, 0.0),
) -> AffineCamera:
    """Orthographic pushbroom-style affine camera looking along the view
    vector, scaled to ``gsd`` metres/pixel."""
    v = view_vector(incidence_deg, azimuth_deg)
    up = np.array([0.0, 0.0, 1.0])
    e1 = np.cross(up, v)
    if np.linalg.norm(e1) < 1e-8:
        e1 = np.array([1.0, 0.0, 0.0])
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(v, e1)
    A = np.stack([e1, e2]) / gsd
    return AffineCamera(
        A=jnp.asarray(A, jnp.float32),
        b=jnp.asarray(np.asarray(offset, np.float64), jnp.float32),
    )


def rpc_from_affine_camera(
    cam: AffineCamera, frame: LocalFrame, img_shape,
    h_range=(0.0, 50.0), aoi_half_deg=0.005,
) -> RPCCamera:
    """Exact RPC00B wrapper of an affine camera (denominators == 1).

    pix = A @ local(lon, lat, h) + b is affine in (lon, lat, h); express it
    in the normalized RPC coordinate system so ``RPCCamera.project``
    reproduces the affine camera to float precision.
    """
    A = np.asarray(cam.A, np.float64)
    b = np.asarray(cam.b, np.float64)
    lon0 = float(frame.lon0)
    lat0 = float(frame.lat0)
    kx = M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
    ky = M_PER_DEG_LAT
    # pix = A @ diag(kx, ky, 1) @ (lon-lon0, lat-lat0, h) + b
    Ad = A @ np.diag([kx, ky, 1.0])
    offs = dict(
        LONG_OFF=lon0, LAT_OFF=lat0, HEIGHT_OFF=0.5 * (h_range[0] + h_range[1]),
        LONG_SCALE=aoi_half_deg, LAT_SCALE=aoi_half_deg,
        HEIGHT_SCALE=max(1.0, 0.5 * (h_range[1] - h_range[0])),
        SAMP_OFF=img_shape[1] / 2, LINE_OFF=img_shape[0] / 2,
        SAMP_SCALE=img_shape[1] / 2, LINE_SCALE=img_shape[0] / 2,
    )
    out = []
    for i, (pix_off, pix_scale) in enumerate(
        [(offs["SAMP_OFF"], offs["SAMP_SCALE"]), (offs["LINE_OFF"], offs["LINE_SCALE"])]
    ):
        const = (Ad[i, 2] * offs["HEIGHT_OFF"] + b[i] - pix_off) / pix_scale
        c_lon = Ad[i, 0] * offs["LONG_SCALE"] / pix_scale
        c_lat = Ad[i, 1] * offs["LAT_SCALE"] / pix_scale
        c_h = Ad[i, 2] * offs["HEIGHT_SCALE"] / pix_scale
        out.append(np.array([const, c_lon, c_lat, c_h], np.float64))
    return make_affine_rpc(out[0], out[1], offs)


@dataclass
class SyntheticScene:
    """A rendered multi-view scene with exact truth."""

    images: list            # list of (H, W) jnp arrays, radiometrically varied
    heights: list           # per-view (H, W) ground-truth surface height (m)
    cameras: list           # AffineCamera per view
    rpcs: list              # exact RPCCamera per view
    frame: LocalFrame
    terrain: jnp.ndarray    # (Hg, Wg) height field (m)
    texture: jnp.ndarray    # (Hg, Wg) ortho reflectance
    ground_gsd: float       # metres per terrain grid cell
    ground_origin: tuple    # local (x, y) of terrain[0, 0]
    h_range: tuple


def _smooth_noise(key, shape, scales=(4, 16, 64), amps=(1.0, 0.5, 0.25)):
    out = jnp.zeros(shape, jnp.float32)
    for s, a in zip(scales, amps):
        key, sub = jax.random.split(key)
        low = jax.random.normal(sub, (shape[0] // s + 2, shape[1] // s + 2))
        ys = jnp.linspace(0, low.shape[0] - 2, shape[0])
        xs = jnp.linspace(0, low.shape[1] - 2, shape[1])
        up = map_coordinates(low, *jnp.meshgrid(ys, xs, indexing="ij"))
        out = out + a * up
    return out


def make_terrain(key, shape=(768, 768), gsd=0.5, h_range=(0.0, 50.0),
                 n_buildings=24, terrain_fraction=0.4,
                 building_size_px=(8, 48), building_h_m=None,
                 base_scales=(96, 192)):
    """Smooth relief + boxy 'buildings' with flat roofs (height field, m).

    ``terrain_fraction`` is the share of ``h_range`` taken by the smooth
    base relief; buildings rise to 30–90% of the range by default, or to an
    absolute ``building_h_m = (lo_m, hi_m)`` above the LOCAL ground when
    given. The absolute form matters for deep-relief scenes (the reference's
    MAX_DISP=288 envelope, ``constants.py:54-57``): with 100+ m of range the
    relative rule makes towers far taller than their footprint is wide,
    whose occlusion shadows no real matcher (nor the reference's SGBM) can
    resolve — real deep relief is mostly smooth topography with ordinary
    buildings on it."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = _smooth_noise(k1, shape, scales=base_scales, amps=(1.0, 1.0))
    base = base - base.min()
    base = base / jnp.maximum(base.max(), 1e-6)
    lo, hi = h_range
    # building stamping runs on host (one device fetch total): 24 sequential
    # masked updates as device ops would be 24 dispatch round-trips
    terrain = np.array(lo + base * (hi - lo) * terrain_fraction)
    ground = terrain.copy()   # pre-building relief: absolute building
    # heights reference this, so overlapping footprints never stack

    hg, wg = shape
    ys, xs = np.mgrid[0:hg, 0:wg].astype(np.float32)
    centers = np.asarray(
        jax.random.uniform(k2, (n_buildings, 2), minval=0.1, maxval=0.9))
    sizes = np.asarray(
        jax.random.uniform(k3, (n_buildings, 3), minval=0.2, maxval=1.0))
    s_lo, s_hi = building_size_px
    for i in range(n_buildings):
        cy = centers[i, 0] * hg
        cx = centers[i, 1] * wg
        sy = s_lo + sizes[i, 0] * (s_hi - s_lo)
        sx = s_lo + sizes[i, 1] * (s_hi - s_lo)
        inside = (np.abs(ys - cy) < sy) & (np.abs(xs - cx) < sx)
        if building_h_m is None:
            bh = lo + (hi - lo) * (0.3 + 0.6 * sizes[i, 2])
        else:
            # absolute height above local (pre-building) ground at the centre
            g = ground[int(cy), int(cx)]
            bh = g + building_h_m[0] + sizes[i, 2] * (
                building_h_m[1] - building_h_m[0])
        terrain[inside] = np.maximum(terrain[inside], bh)
    return jnp.asarray(terrain)


def make_texture(key, shape=(768, 768), scales=(2, 8, 32),
                 amps=(1.0, 0.8, 0.6), contrast: float = 1.0):
    """Matchable ortho texture in [0, 1].

    ``scales``/``amps`` set the spatial-frequency mix (larger scales =
    blander, harder-to-match surfaces); ``contrast < 1`` compresses the
    dynamic range around mid-grey — the low-texture scene family."""
    tex = _smooth_noise(key, shape, scales=scales, amps=amps)
    tex = tex - tex.min()
    tex = tex / jnp.maximum(tex.max(), 1e-6)
    return 0.5 + contrast * (tex - 0.5)


@partial(jax.jit, static_argnames=("out_shape", "iters"))
def render_view(
    cam: AffineCamera,
    terrain: jnp.ndarray,
    texture: jnp.ndarray,
    ground_origin,
    gsd: float,
    out_shape,
    iters: int = 12,
):
    """Render the terrain/texture through an affine camera.

    Per-pixel fixed-point ray/terrain intersection: invert the camera's 2x2
    (x, y) block at a height guess, look up the terrain, repeat. Converges
    everywhere except sub-pixel bands at building walls (occlusion edges),
    which real stereo also treats as invalid. Returns (image, gt_height).
    """
    A = cam.A
    b = cam.b
    A2 = A[:, :2]
    A2inv = jnp.linalg.inv(A2)
    az = A[:, 2]

    h, w = out_shape
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    pix = jnp.stack([px, py], axis=-1)  # (h, w, 2) in (col,row)=(x,y)

    ox, oy = ground_origin
    mean_h = jnp.mean(terrain)

    def ground_xy(z):
        rhs = pix - b - az * z[..., None]
        # elementwise 2x2 solve (no matmul: default dot precision is bf16)
        x = rhs[..., 0] * A2inv[0, 0] + rhs[..., 1] * A2inv[0, 1]
        y = rhs[..., 0] * A2inv[1, 0] + rhs[..., 1] * A2inv[1, 1]
        return jnp.stack([x, y], axis=-1)

    def lookup(xy):
        gx = (xy[..., 0] - ox) / gsd
        gy = (xy[..., 1] - oy) / gsd
        return map_coordinates(terrain, gy, gx, fill=jnp.nan)

    def body(_, z):
        return lookup(ground_xy(z))

    z0 = jnp.full((h, w), mean_h)
    z = jax.lax.fori_loop(0, iters, body, z0)

    xy = ground_xy(z)
    gx = (xy[..., 0] - ox) / gsd
    gy = (xy[..., 1] - oy) / gsd
    img = map_coordinates(texture, gy, gx, fill=-1.0)
    return img, z


def make_stereo_scene(
    seed: int = 0,
    ground_shape=(768, 768),
    gsd: float = 0.5,
    h_range=(0.0, 50.0),
    views=((12.0, 90.0), (22.0, 260.0)),
    out_shape=(640, 640),
    radiometric_jitter: float = 0.15,
    origin_lonlat=(TARGET_LON, TARGET_LAT),
    terrain_kwargs: dict | None = None,
    texture_kwargs: dict | None = None,
    noise_sigma: float = 0.01,
) -> SyntheticScene:
    """Full multi-view scene. ``views`` are (incidence°, azimuth°) per date.

    Per-view radiometric gain/offset jitter emulates the cross-date
    brightness drift the reference normalises away (``disparity.py:66-70``).
    ``origin_lonlat`` anchors the local frame — RPC00B serialisation tests
    use 4-decimal-representable anchors (the TRE's ASCII field precision).
    """
    key = jax.random.PRNGKey(seed)
    kt, kx, kr = jax.random.split(key, 3)
    terrain = make_terrain(kt, ground_shape, gsd, h_range,
                           **(terrain_kwargs or {}))
    texture = make_texture(kx, ground_shape, **(texture_kwargs or {}))

    hg, wg = ground_shape
    origin = (-0.5 * wg * gsd, -0.5 * hg * gsd)
    frame = LocalFrame(lon0=jnp.float32(origin_lonlat[0]),
                       lat0=jnp.float32(origin_lonlat[1]))

    images, heights, cams, rpcs = [], [], [], []
    for i, (inc, az) in enumerate(views):
        cam = make_satellite_camera(inc, az, gsd,
                                    offset=(out_shape[1] / 2, out_shape[0] / 2))
        img, z = render_view(cam, terrain, texture, origin, gsd, out_shape)
        kr, sub = jax.random.split(kr)
        gain = 1.0 + radiometric_jitter * float(jax.random.normal(sub, ()))
        kr, sub = jax.random.split(kr)
        offset = 0.1 * radiometric_jitter * float(jax.random.normal(sub, ()))
        kr, sub = jax.random.split(kr)
        noise = noise_sigma * jax.random.normal(sub, img.shape)
        jimg = jnp.where(img >= 0, jnp.clip(img * gain + offset + noise, 0, 4), -1.0)
        images.append(jimg)
        heights.append(z)
        cams.append(cam)
        rpcs.append(rpc_from_affine_camera(cam, frame, out_shape, h_range))

    return SyntheticScene(
        images=images, heights=heights, cameras=cams, rpcs=rpcs,
        frame=frame, terrain=terrain, texture=texture,
        ground_gsd=gsd, ground_origin=origin, h_range=h_range,
    )


def aoi_lonlat_ranges(scene: SyntheticScene):
    """Lon/lat bounds of the scene's ground extent (for probe grids)."""
    ox, oy = scene.ground_origin
    hg, wg = scene.terrain.shape
    xs = np.array([ox, ox + wg * scene.ground_gsd])
    ys = np.array([oy, oy + hg * scene.ground_gsd])
    lon, lat, _ = scene.frame.to_geodetic(jnp.asarray(xs, jnp.float32),
                                          jnp.asarray(ys, jnp.float32), 0.0)
    lon = np.asarray(lon)
    lat = np.asarray(lat)
    return (float(lon.min()), float(lon.max())), (float(lat.min()), float(lat.max()))


# ---------------------------------------------------------------------------
# Scene families — the multi-scene accuracy harness.
#
# Each family stresses one failure mode of the dense matcher; the accuracy
# sweep (bench.py / tests/test_scene_families.py) gates height RMSE per
# family so no fast path is ever accepted on the scene it was tuned on
# alone. All families share ``out_shape``, ``h_range`` and ``views`` so one
# compiled pair_core executable serves the whole sweep (the geometry-derived
# StereoConfig is identical across families).
# ---------------------------------------------------------------------------

SCENE_FAMILIES: dict = {
    # default mix of relief + mid-rise buildings (the historical bench scene)
    "baseline": {},
    # discontinuity-dense built-up core: tall buildings, most of the
    # height budget in vertical steps (foreground fattening / occlusion)
    "urban": dict(terrain_kwargs=dict(
        n_buildings=40, terrain_fraction=0.25,
        building_size_px=(14, 56), building_h_m=(8.0, 24.0))),
    # steep smooth topography: high-gradient slopes, no steps
    "steep": dict(terrain_kwargs=dict(
        terrain_fraction=1.0, n_buildings=6, base_scales=(48, 96))),
    # bland, low-contrast surfaces (fields / water margins)
    "lowtex": dict(texture_kwargs=dict(
        scales=(8, 32, 64), amps=(0.6, 1.0, 0.8), contrast=0.35)),
    # cross-date radiometric mismatch (the reference normalises this away,
    # disparity.py:66-70): strong per-view gain/offset drift
    "crossdate": dict(radiometric_jitter=0.45, noise_sigma=0.02),
    # sensor noise at 4x the default
    "noisy": dict(noise_sigma=0.04),
}


def make_family_scene(family: str, seed: int = 11, out_shape=(384, 384),
                      ground_shape=(512, 512), h_range=(0.0, 40.0),
                      views=((12.0, 90.0), (22.0, 260.0)),
                      **overrides) -> SyntheticScene:
    """Build one scene of a named family (see :data:`SCENE_FAMILIES`)."""
    kw = dict(SCENE_FAMILIES[family])
    kw.update(overrides)
    return make_stereo_scene(seed=seed, out_shape=out_shape,
                             ground_shape=ground_shape, h_range=h_range,
                             views=views, **kw)
