"""AOI crop windows from KML + RPC — replaces the GDAL RPC transformer path.

The reference projects the 4 corners of the KML extent to pixel coordinates
with GDAL's RPC transformer at Z=0 and clamps to image bounds
(``get_crop_area_from_kml``, ``preprocessing.py:7-66``), then crops with
``gdal.Translate`` (``generate_cropped`` ``:68-96``). Here the projection is
our own RPC forward model and the crop is an array slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from pcmi_tpu.geometry.rpc import RPCCamera
from pcmi_tpu.io.kml import kml_extent


@dataclass(frozen=True)
class CropWindow:
    """(x_off, y_off, width, height) in pixels + the source geometry."""

    x_off: int
    y_off: int
    width: int
    height: int

    @property
    def slices(self) -> Tuple[slice, slice]:
        return (slice(self.y_off, self.y_off + self.height),
                slice(self.x_off, self.x_off + self.width))

    def as_list(self):
        # reference saves [x0, y0, x1, y1, 0, 0, 0, 0] (preprocessing.py:88-93)
        return [self.x_off, self.y_off, self.x_off + self.width,
                self.y_off + self.height, 0, 0, 0, 0]


def crop_window_from_extent(
    rpc: RPCCamera,
    lon_range: Tuple[float, float],
    lat_range: Tuple[float, float],
    image_shape: Tuple[int, int],
    height: float = 0.0,
    pad: int = 0,
    align: int = 1,
) -> CropWindow:
    """Project the AOI corners through the RPC and clamp to image bounds.

    ``align`` rounds the window origin/size to a multiple (pad-to-tile
    discipline for static jit shapes); ``pad`` adds margin pixels first.
    """
    lons = [lon_range[0], lon_range[0], lon_range[1], lon_range[1]]
    lats = [lat_range[0], lat_range[1], lat_range[0], lat_range[1]]
    col, row = rpc.project_np(np.asarray(lons), np.asarray(lats),
                              np.full(4, height))
    h, w = image_shape
    x0 = max(0, int(np.floor(col.min())) - pad)
    y0 = max(0, int(np.floor(row.min())) - pad)
    x1 = min(w, int(np.ceil(col.max())) + pad)
    y1 = min(h, int(np.ceil(row.max())) + pad)
    if x1 <= x0 or y1 <= y0:
        raise ValueError("AOI does not intersect the image")
    if align > 1:
        x0 = (x0 // align) * align
        y0 = (y0 // align) * align
        x1 = min(w, ((x1 + align - 1) // align) * align)
        y1 = min(h, ((y1 + align - 1) // align) * align)
    return CropWindow(x_off=x0, y_off=y0, width=x1 - x0, height=y1 - y0)


def crop_window_from_kml(
    rpc: RPCCamera, kml_path: str, image_shape, height: float = 0.0,
    pad: int = 0, align: int = 1,
) -> CropWindow:
    lon_range, lat_range = kml_extent(kml_path)
    return crop_window_from_extent(rpc, lon_range, lat_range, image_shape,
                                   height, pad, align)


def shift_rpc(rpc: RPCCamera, window: CropWindow) -> RPCCamera:
    """RPC for the cropped image: pixel offsets shift by the window origin
    (what gdal.Translate records in the cropped file's RPC metadata)."""
    import dataclasses
    import jax.numpy as jnp

    out = dataclasses.replace(
        rpc,
        samp_off=rpc.samp_off - jnp.float32(window.x_off),
        line_off=rpc.line_off - jnp.float32(window.y_off),
    )
    # carry the float64 host copies through (dataclasses.replace drops
    # plain attributes); the shift is exact in f64
    f64 = getattr(rpc, "_f64", None)
    if f64 is not None:
        f64 = dict(f64)
        f64["SAMP_OFF"] = f64["SAMP_OFF"] - window.x_off
        f64["LINE_OFF"] = f64["LINE_OFF"] - window.y_off
        out._f64 = f64
    return out
