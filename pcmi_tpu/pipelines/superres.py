"""Super-resolution + inpainting plugins (Stan's component family).

Rebuild of ``members/stan/plugin.py``: ``StanSuperRes`` (``:214-311``) runs
a U-Net residual model over the bicubic 4x upsample and returns LR /
bicubic / SR layers; ``StanInpainter`` (``:117-211``) detects near-black
holes and repaints them. Here both plugins drive the Flax models
(:mod:`pcmi_tpu.models.unet`) with orbax checkpoint loading in place of the
torch ``.pt`` state dicts (``:228-245``); with no checkpoint on disk the
plugins still run (fresh-initialised weights), mirroring the reference's
degrade-don't-crash habit.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcmi_tpu.interface import Layer, SatellitePlugin
from pcmi_tpu.models.unet import InpaintUNet, SRUNet, bicubic_upsample
from pcmi_tpu.ops.morphology import binary_dilation


def _pad_to_multiple(arr: np.ndarray, m: int):
    """Edge-pad H, W to multiples of ``m`` (U-Net decoders need it);
    returns (padded, (h0, w0)) for cropping back."""
    h0, w0 = arr.shape[:2]
    ph = (-h0) % m
    pw = (-w0) % m
    if ph or pw:
        widths = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, widths, mode="edge")
    return arr, (h0, w0)


def create_inpaint_mask(image: np.ndarray, thresh: float = 1.0 / 255.0,
                        margin: int = 2) -> np.ndarray:
    """Near-black hole detection (ref ``create_inpaint_mask``
    ``stan/plugin.py:52-61``: all channels <= 1)."""
    img = np.asarray(image, np.float32)
    scale = img.max() if img.max() > 1.5 else 1.0
    mono = (img / scale)
    if mono.ndim == 3:
        hole = (mono <= thresh).all(-1)
    else:
        hole = mono <= thresh
    return np.asarray(binary_dilation(jnp.asarray(hole), iterations=margin))


class SuperResolutionPlugin(SatellitePlugin):
    """4x SR (ref ``StanSuperRes.run`` ``plugin.py:247-311``)."""

    def __init__(self, checkpoint: Optional[str] = None, factor: int = 4):
        self.model = SRUNet()
        self.factor = factor
        self.params = None
        self.checkpoint = checkpoint

    @property
    def name(self) -> str:
        return "Super Resolution"

    def _params_for(self, up: jnp.ndarray):
        if self.params is None:
            if self.checkpoint and os.path.exists(self.checkpoint):
                from pcmi_tpu.models.training import restore_checkpoint

                template = self.model.init(jax.random.PRNGKey(0), up)
                self.params = restore_checkpoint(self.checkpoint, template)
            else:
                self.params = self.model.init(jax.random.PRNGKey(0), up)
        return self.params

    def run(self, image: np.ndarray, viewer=None) -> List[Layer]:
        img = np.asarray(image, np.float32)
        scale = img.max() if img.max() > 1.5 else 1.0
        x = img / scale
        if x.ndim == 2:
            x = np.stack([x] * 3, -1)
        # SRUNet has 2 downsamples: the 4x-upsampled frame needs H, W % 4 == 0,
        # i.e. the LR frame padded to even dims
        x, (h0, w0) = _pad_to_multiple(x, 2)
        lr = jnp.asarray(x)[None]
        up = bicubic_upsample(lr, self.factor)
        sr = self.model.apply(self._params_for(up), up)
        f = self.factor
        up_np = np.asarray(up[0])[: h0 * f, : w0 * f]
        sr_np = np.asarray(sr[0])[: h0 * f, : w0 * f]
        return [
            (image, {"name": "low-res input"}, "image"),
            (up_np * scale, {"name": "bicubic 4x"}, "image"),
            (np.clip(sr_np, 0, 1) * scale, {"name": "super-res 4x"}, "image"),
        ]


class InpaintingPlugin(SatellitePlugin):
    """Hole inpainting (ref ``StanInpainter.run`` ``plugin.py:143-211``)."""

    def __init__(self, checkpoint: Optional[str] = None):
        self.model = InpaintUNet()
        self.params = None
        self.checkpoint = checkpoint

    @property
    def name(self) -> str:
        return "Inpainting"

    def run(self, image: np.ndarray, viewer=None,
            mask: Optional[np.ndarray] = None) -> List[Layer]:
        img = np.asarray(image, np.float32)
        scale = img.max() if img.max() > 1.5 else 1.0
        x = img / scale
        if x.ndim == 2:
            x = np.stack([x] * 3, -1)
        if mask is None:
            mask = create_inpaint_mask(img)
        # InpaintUNet has 3 downsamples -> H, W must be multiples of 8
        x, (h0, w0) = _pad_to_multiple(x, 8)
        mask_p, _ = _pad_to_multiple(np.asarray(mask, np.float32), 8)
        m = jnp.asarray(mask_p, jnp.float32)[None, ..., None]
        rgb = jnp.asarray(x)[None]
        # prefill conditioning — must match InpaintGANTrainer._condition
        from pcmi_tpu.ops.filters import masked_jacobi_fill

        filled = masked_jacobi_fill(rgb[0], m[0, ..., 0], 64)[None]
        inp = jnp.concatenate([filled, m], axis=-1)
        if self.params is None:
            if self.checkpoint and os.path.exists(self.checkpoint):
                from pcmi_tpu.models.training import restore_checkpoint

                template = self.model.init(jax.random.PRNGKey(0), inp)
                self.params = restore_checkpoint(self.checkpoint, template)
            else:
                self.params = self.model.init(jax.random.PRNGKey(0), inp)
        out = self.model.apply(self.params, inp)
        return [
            (image, {"name": "input"}, "image"),
            (np.asarray(mask).astype(np.uint8),
             {"name": "hole mask", "opacity": 0.4}, "image"),
            (np.clip(np.asarray(out[0])[:h0, :w0], 0, 1) * scale,
             {"name": "inpainted"}, "image"),
        ]
