"""Sentinel-2 style band loaders (reference ``members/marcin/utils.py``).

The reference host and Marcin's widgets load Sentinel-2 GeoTIFFs and build
RGB previews from bands 4/3/2 with a 2-98 percentile stretch
(``load_image_as_rgb`` ``utils.py:43-54``, NaN-preserving variant
``load_image_with_nans`` ``:57-77``, host loader ``viewer.py:407-426``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from pcmi_tpu.io.native import read_tiff_fast
from pcmi_tpu.ops.normalize import percentile_stretch


def load_bands(path: str) -> np.ndarray:
    """(H, W, B) float32 band stack from a multi-band TIFF."""
    arr = np.asarray(read_tiff_fast(path), np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def bands_to_rgb(stack: np.ndarray, rgb_bands: Sequence[int] = (3, 2, 1),
                 p_lo: float = 2.0, p_hi: float = 98.0) -> np.ndarray:
    """Bands 4/3/2 (0-indexed 3/2/1) -> stretched RGB in [0, 1], NaN-safe."""
    out = []
    for b in rgb_bands:
        band = stack[..., min(b, stack.shape[-1] - 1)]
        mask = np.isfinite(band)
        stretched = np.asarray(percentile_stretch(
            jnp.asarray(np.nan_to_num(band)), jnp.asarray(mask), p_lo, p_hi))
        stretched[~mask] = np.nan
        out.append(stretched)
    return np.stack(out, axis=-1)


def load_rgb(path: str, rgb_bands: Sequence[int] = (3, 2, 1)) -> np.ndarray:
    """Reference ``load_image_as_rgb`` parity: file -> stretched RGB."""
    return bands_to_rgb(load_bands(path), rgb_bands)
