"""Local frames and affine-camera approximation of RPC cameras.

Fixes and completes the reference's dead ``affine_camera.py`` (its
``from_rpc`` references an undefined ``cls`` and ``project`` returns an
undefined ``u`` — reference ``affine_camera.py:61,64``; the file is never
imported). Here the affine fit is the foundation of the ASP-free epipolar
rectification in :mod:`pcmi_tpu.geometry.rectify`.

A *local frame* converts geodetic (lon, lat, h) to metric ENU coordinates
around an anchor point; over a city-scale AOI the equirectangular
approximation is sub-centimetre compared to full ECEF->ENU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pcmi_tpu.geometry.rpc import RPCCamera

# metres per degree at the equator (WGS84 mean)
M_PER_DEG_LAT = 111_132.0
M_PER_DEG_LON_EQ = 111_320.0


@jax.tree_util.register_pytree_node_class
@dataclass
class LocalFrame:
    """Equirectangular ENU frame anchored at (lon0, lat0, h0=0)."""

    lon0: jnp.ndarray
    lat0: jnp.ndarray

    def tree_flatten(self):
        return (self.lon0, self.lat0), None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    def to_local(self, lon, lat, h):
        x = (lon - self.lon0) * M_PER_DEG_LON_EQ * jnp.cos(jnp.deg2rad(self.lat0))
        y = (lat - self.lat0) * M_PER_DEG_LAT
        return x, y, h

    def to_geodetic(self, x, y, z):
        lon = self.lon0 + x / (M_PER_DEG_LON_EQ * jnp.cos(jnp.deg2rad(self.lat0)))
        lat = self.lat0 + y / M_PER_DEG_LAT
        return lon, lat, z

    def to_local_np(self, lon, lat, h):
        """Host float64 twin of :meth:`to_local` (see RPCCamera.project_np)."""
        lat0 = float(self.lat0)
        lon0 = float(self.lon0)
        x = (np.asarray(lon, np.float64) - lon0) * M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
        y = (np.asarray(lat, np.float64) - lat0) * M_PER_DEG_LAT
        return x, y, np.asarray(h, np.float64)


@jax.tree_util.register_pytree_node_class
@dataclass
class AffineCamera:
    """2x4 affine camera in a local metric frame: ``pix = A @ xyz + b``.

    ``A`` is (2, 3); ``b`` is (2,); pixel order is (col, row) == (x, y).
    """

    A: jnp.ndarray
    b: jnp.ndarray

    def tree_flatten(self):
        return (self.A, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    def project(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Project ``(..., 3)`` local points to ``(..., 2)`` pixels.

        HIGHEST precision: the default accelerator matmul truncates to
        bfloat16, which is ~1 px at these coordinate magnitudes.
        """
        return jnp.einsum(
            "...k,pk->...p", xyz, self.A, precision=jax.lax.Precision.HIGHEST
        ) + self.b

    def view_direction(self) -> jnp.ndarray:
        """Unit null-vector of A — the (parallel) viewing ray direction."""
        # cross product of the two rows of A spans the null space
        d = jnp.cross(self.A[0], self.A[1])
        d = d / jnp.linalg.norm(d)
        # orient upward (towards the satellite)
        return jnp.where(d[2] < 0, -d, d)


def probe_grid(
    lon_range, lat_range, h_range, shape=(8, 8, 5)
) -> np.ndarray:
    """Regular (N, 3) lon/lat/h probe lattice over the AOI volume."""
    lons = np.linspace(lon_range[0], lon_range[1], shape[0])
    lats = np.linspace(lat_range[0], lat_range[1], shape[1])
    hs = np.linspace(h_range[0], h_range[1], shape[2])
    g = np.stack(np.meshgrid(lons, lats, hs, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)


def fit_affine_camera(
    rpc: RPCCamera, frame: LocalFrame, probes_llh: np.ndarray
) -> AffineCamera:
    """Least-squares affine camera fit through RPC projections of a probe
    lattice — the approach sketched (but broken) in reference
    ``affine_camera.py:20-45``.

    For WV3-class narrow-FOV imagery over a city-scale AOI, the affine
    residual vs the full RPC is a small fraction of a pixel.
    """
    # Host float64 end to end: geodetic degrees in float32 quantize to
    # ~0.5 px at WV3 GSD, and float32 lstsq loses another ~1 px.
    col, row = rpc.project_np(probes_llh[:, 0], probes_llh[:, 1], probes_llh[:, 2])
    x, y, z = frame.to_local_np(probes_llh[:, 0], probes_llh[:, 1], probes_llh[:, 2])
    X = np.stack([x, y, z, np.ones(len(probes_llh))], axis=1)
    pix = np.stack([col, row], axis=1)
    theta, *_ = np.linalg.lstsq(X, pix, rcond=None)
    return AffineCamera(
        A=jnp.asarray(theta[:3].T, jnp.float32),
        b=jnp.asarray(theta[3], jnp.float32),
    )


def affine_fit_residual(rpc: RPCCamera, frame: LocalFrame, cam: AffineCamera,
                        probes_llh: np.ndarray) -> float:
    """Max pixel residual of the affine fit over the probe lattice."""
    col, row = rpc.project_np(probes_llh[:, 0], probes_llh[:, 1], probes_llh[:, 2])
    x, y, z = frame.to_local_np(probes_llh[:, 0], probes_llh[:, 1], probes_llh[:, 2])
    X = np.stack([x, y, z], axis=1)
    pred = X @ np.asarray(cam.A, np.float64).T + np.asarray(cam.b, np.float64)
    err = np.hypot(pred[:, 0] - col, pred[:, 1] - row)
    return float(err.max())
