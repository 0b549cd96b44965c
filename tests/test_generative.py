"""Generative processors + SR/inpaint plugin layer contracts."""

import numpy as np
import jax.numpy as jnp

from pcmi_tpu.models.dip import DIPConfig, DIPEngine
from pcmi_tpu.models.unet import DIPUNet
from pcmi_tpu.pipelines.generative import (
    EnhancementProcessor,
    ImageRestorationProcessor,
    StitchingProcessor,
    available_engines,
    diffusion_prefill,
    feather_blend,
    nan_mask,
)
from pcmi_tpu.pipelines.superres import (
    InpaintingPlugin,
    SuperResolutionPlugin,
    create_inpaint_mask,
)


def _tiny_dip():
    eng = DIPEngine(DIPConfig(iters=60, noise_channels=8))
    eng.model = DIPUNet(widths=(8, 16, 16))
    return eng


def test_engine_registry():
    engines = available_engines()
    assert "Deep Image Prior" in engines
    assert "Diffusion" in engines


def test_nan_mask_and_prefill(rng):
    img = rng.uniform(0.2, 0.8, (48, 48)).astype(np.float32)
    img[10:20, 10:20] = np.nan
    mask = nan_mask(img, margin=2)
    assert mask[12, 12] and mask[8, 12]  # hole + margin
    filled = np.asarray(diffusion_prefill(
        jnp.nan_to_num(jnp.asarray(img)), jnp.asarray(mask, jnp.float32)))
    assert np.isfinite(filled).all()
    # fill is in the range of the surroundings, not zero
    assert 0.1 < filled[15, 15] < 0.9


def test_feather_blend_edges():
    orig = jnp.zeros((32, 32))
    gen = jnp.ones((32, 32))
    mask = jnp.zeros((32, 32)).at[8:24, 8:24].set(1.0)
    out = np.asarray(feather_blend(orig, gen, mask, blend_width=4))
    assert out[0, 0] == 0.0          # untouched outside
    assert out[16, 16] == 1.0        # generated deep inside
    assert 0.0 < out[9, 16] < 1.0    # feathered at the rim


def test_restoration_processor_fills_nans(rng):
    img = np.tile(np.linspace(0.2, 0.8, 48, np.float32)[None, :], (48, 1))
    img[20:26, 20:26] = np.nan
    out = ImageRestorationProcessor(_tiny_dip(), margin=2).process(img)
    assert np.isfinite(out).all()
    err = np.abs(out[20:26, 20:26] -
                 np.tile(np.linspace(0.2, 0.8, 48, np.float32)[None, 20:26], (6, 1)))
    # 60-iter tiny-net DIP is a smoke config; full config (800 iters) gets
    # much closer — this gate just proves the hole is plausibly filled
    assert err.mean() < 0.3


def test_stitching_processor_compose_and_fill(rng):
    left = rng.uniform(0.3, 0.5, (32, 24)).astype(np.float32)
    right = rng.uniform(0.3, 0.5, (32, 24)).astype(np.float32)
    proc = StitchingProcessor(_tiny_dip(), overlap=16)
    canvas, mask = proc.compose(left, right)
    assert canvas.shape == (32, 64)
    assert mask[:, 24:40].all() and not mask[:, :24].any()
    out = proc.process(left, right)
    assert out.shape == (32, 64) and np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :20], left[:, :20], atol=1e-5)


def test_enhancement_processor_keeps_high_freq(rng):
    img = rng.uniform(0.2, 0.8, (32, 32)).astype(np.float32)
    out = EnhancementProcessor(_tiny_dip(), hf_weight=1.0).process(img)
    assert out.shape == img.shape
    # high-frequency content must survive (correlation with input detail)
    hf_in = img - img.mean()
    hf_out = out - out.mean()
    corr = (hf_in * hf_out).sum() / (np.linalg.norm(hf_in) * np.linalg.norm(hf_out) + 1e-9)
    assert corr > 0.3


def test_create_inpaint_mask_black_holes():
    img = np.full((32, 32, 3), 128, np.float32)
    img[10:14, 10:14] = 0.0
    mask = create_inpaint_mask(img, margin=1)
    assert mask[11, 11] and mask[9, 11]
    assert not mask[20, 20]


def test_superres_plugin_layers(rng):
    img = (rng.uniform(0, 1, (16, 16)) * 255).astype(np.float32)
    layers = SuperResolutionPlugin().run(img)
    names = [p["name"] for _, p, _ in layers]
    assert names == ["low-res input", "bicubic 4x", "super-res 4x"]
    assert layers[1][0].shape[:2] == (64, 64)
    assert layers[2][0].shape[:2] == (64, 64)


def test_inpainting_plugin_layers(rng):
    img = (rng.uniform(0.3, 1, (32, 32, 3)) * 255).astype(np.float32)
    img[12:16, 12:16] = 0.0
    layers = InpaintingPlugin().run(img)
    names = [p["name"] for _, p, _ in layers]
    assert names == ["input", "hole mask", "inpainted"]
    assert layers[1][0][13, 13] == 1
