"""Generative restoration / stitching / enhancement processors + engines.

Rebuild of Marcin's stack (``members/marcin/``): an engine registry
(``models/__init__.py:9-12``), three task processors
(``components/{restoration,stitching,enhancement}.py``) and their shared
pre/post steps:

* NaN-mask extraction + dilation margin (``components/restoration.py:19-30``)
* Telea prefill (``:9-16``) — replaced by a masked diffusion fill
  (:func:`diffusion_prefill`): Jacobi relaxation of the hole from its rim,
  a jittable stand-in with the same role (seed the generative model with
  something smooth).
* distance-transform feathered re-blend (``models/utils.py:7-22``)
* side-by-side composite with an ``overlap`` gap for stitching
  (``components/stitching.py:61-83``)
* high-frequency re-blend for enhancement (``components/enhancement.py:9-30``)

Engines: :class:`pcmi_tpu.models.dip.DIPEngine` (Deep Image Prior) and
:class:`pcmi_tpu.models.diffusion.TiledDiffusionEngine` (MultiDiffusion)
behind one duck-typed ``restore(image, mask)`` surface.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pcmi_tpu.interface import Layer, SatellitePlugin
from pcmi_tpu.ops.filters import gaussian_filter, masked_jacobi_fill
from pcmi_tpu.ops.morphology import binary_dilation, distance_transform

# canonical implementation lives in ops.filters (shared with the inpaint
# trainer's conditioning); this name is the established pipeline surface
diffusion_prefill = masked_jacobi_fill


@partial(jax.jit, static_argnames=("blend_width",))
def feather_blend(original, generated, mask, blend_width: int = 8):
    """Distance-feathered composite of ``generated`` into ``original`` inside
    ``mask`` (ref ``models/utils.py:7-22`` uses distance_transform_edt)."""
    d = distance_transform(mask > 0.5, max_dist=blend_width)
    alpha = jnp.clip(d / blend_width, 0.0, 1.0)
    if original.ndim == 3:
        alpha = alpha[..., None]
    return original * (1.0 - alpha) + generated * alpha


def nan_mask(image: np.ndarray, margin: int = 10) -> np.ndarray:
    """NaN pixels -> hole mask, dilated by ``margin``
    (ref ``create_nan_mask`` ``components/restoration.py:19-30``)."""
    m = ~np.isfinite(np.asarray(image))
    if m.ndim == 3:
        m = m.any(-1)
    return np.asarray(binary_dilation(jnp.asarray(m), iterations=margin))


class ImageRestorationProcessor:
    """mask -> prefill -> engine.restore -> feathered blend
    (ref ``components/restoration.py:43-68``)."""

    def __init__(self, engine, margin: int = 10, blend_width: int = 8):
        self.engine = engine
        self.margin = margin
        self.blend_width = blend_width

    def process(self, image: np.ndarray, mask: np.ndarray | None = None):
        img = np.asarray(image, np.float32)
        if mask is None:
            mask = nan_mask(img, self.margin)
        m = jnp.asarray(mask, jnp.float32)
        clean = jnp.nan_to_num(jnp.asarray(img))
        prefilled = diffusion_prefill(clean, m)
        restored = self.engine.restore(prefilled, m).output
        return np.asarray(feather_blend(clean, restored, m, self.blend_width))


class StitchingProcessor:
    """Side-by-side composite with an ``overlap`` gap the engine must
    hallucinate (ref ``components/stitching.py:24-83``)."""

    def __init__(self, engine, overlap: int = 64, blend_width: int = 5):
        self.engine = engine
        self.overlap = overlap
        self.blend_width = blend_width

    def compose(self, left: np.ndarray, right: np.ndarray):
        left = np.asarray(left, np.float32)
        right = np.asarray(right, np.float32)
        h = min(left.shape[0], right.shape[0])
        left, right = left[:h], right[:h]
        gap = self.overlap
        w = left.shape[1] + gap + right.shape[1]
        shape = (h, w) + left.shape[2:]
        canvas = np.zeros(shape, np.float32)
        canvas[:, : left.shape[1]] = left
        canvas[:, left.shape[1] + gap:] = right
        mask = np.zeros((h, w), np.float32)
        mask[:, left.shape[1]: left.shape[1] + gap] = 1.0
        return canvas, mask

    def process(self, left: np.ndarray, right: np.ndarray):
        canvas, mask = self.compose(left, right)
        m = jnp.asarray(mask)
        prefilled = diffusion_prefill(jnp.asarray(canvas), m)
        out = self.engine.stitch(prefilled, m).output
        return np.asarray(feather_blend(jnp.asarray(canvas), out, m,
                                        self.blend_width))


class EnhancementProcessor:
    """Whole-image mask + high-frequency re-blend from the original
    (ref ``components/enhancement.py:9-66``)."""

    def __init__(self, engine, hf_sigma: float = 2.0, hf_weight: float = 0.6):
        self.engine = engine
        self.hf_sigma = hf_sigma
        self.hf_weight = hf_weight

    def process(self, image: np.ndarray):
        img = jnp.asarray(np.asarray(image, np.float32))
        # the engine's enhance() fits the WHOLE (known) image and returns
        # its prior-regularised reconstruction — an all-hole mask would
        # mean "nothing known" and train on zero loss
        out = self.engine.enhance(img).output
        hf = img - gaussian_filter(img, self.hf_sigma)
        return np.asarray(jnp.clip(out + self.hf_weight * hf, 0.0, 1.0))


def available_engines() -> Dict[str, Callable]:
    """Engine registry (ref ``models/__init__.py:9-12``)."""
    from pcmi_tpu.models.dip import DIPEngine

    engines: Dict[str, Callable] = {"Deep Image Prior": DIPEngine}
    try:
        from pcmi_tpu.models.diffusion import TiledDiffusionEngine

        engines["Diffusion"] = TiledDiffusionEngine
    except Exception:  # diffusion stays optional (ref import-time degradation)
        pass
    return engines


class RestorationGenerativePlugin(SatellitePlugin):
    """NaN-hole restoration via a generative engine (ref Marcin widgets)."""

    def __init__(self, engine=None):
        if engine is None:
            from pcmi_tpu.models.dip import DIPConfig, DIPEngine
            engine = DIPEngine(DIPConfig(iters=300))
        self.processor = ImageRestorationProcessor(engine)

    @property
    def name(self) -> str:
        return "Generative Restoration"

    def run(self, image: np.ndarray, viewer=None) -> List[Layer]:
        img = np.asarray(image, np.float32)
        # [0,1] convention at the engine boundary: DIP's sigmoid head cannot
        # express 0-255 values (same scale rule as the other plugins)
        scale = img.max() if np.isfinite(img).any() and np.nanmax(img) > 1.5 else 1.0
        restored = self.processor.process(img / scale) * scale
        return [
            (image, {"name": "input"}, "image"),
            (restored, {"name": "restored"}, "image"),
        ]
