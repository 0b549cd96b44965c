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


def test_odd_sizes_do_not_crash(rng):
    """U-Net surfaces must pad arbitrary user image sizes (50x50, 33x47)."""
    from pcmi_tpu.pipelines.superres import InpaintingPlugin, SuperResolutionPlugin

    eng = _tiny_dip()
    img = np.tile(np.linspace(0.2, 0.8, 50, np.float32)[None, :], (50, 1))
    mask = np.zeros((50, 50), np.float32)
    mask[20:26, 20:26] = 1.0
    out = eng.restore(jnp.asarray(img), jnp.asarray(mask)).output
    assert np.asarray(out).shape == (50, 50)

    rgb = (rng.uniform(0.3, 1, (33, 47, 3)) * 255).astype(np.float32)
    rgb[10:13, 10:13] = 0.0
    layers = InpaintingPlugin().run(rgb)
    assert layers[2][0].shape == (33, 47, 3)
    layers = SuperResolutionPlugin().run(rgb[:, :, 0])
    assert layers[2][0].shape[:2] == (33 * 4, 47 * 4)


def test_dip_max_size_downscale():
    from pcmi_tpu.models.dip import DIPConfig, DIPEngine
    from pcmi_tpu.models.unet import DIPUNet

    eng = DIPEngine(DIPConfig(iters=20, noise_channels=8, max_size=32))
    eng.model = DIPUNet(widths=(8, 16, 16))
    img = np.tile(np.linspace(0.2, 0.8, 96, np.float32)[None, :], (96, 1))
    mask = np.zeros((96, 96), np.float32)
    mask[40:50, 40:50] = 1.0
    out = np.asarray(eng.restore(jnp.asarray(img), jnp.asarray(mask)).output)
    assert out.shape == (96, 96)
    # known pixels still exact at full resolution
    np.testing.assert_allclose(out[mask < 0.5], img[mask < 0.5], atol=1e-6)


def test_dip_enhance_fits_image(rng):
    eng = _tiny_dip()
    img = np.tile(np.linspace(0.2, 0.8, 48, np.float32)[None, :], (48, 1))
    out = np.asarray(eng.enhance(jnp.asarray(img)).output)
    # all-known fit: reconstruction approximates the image, not init noise
    assert np.abs(out - img).mean() < 0.1


def test_diffusion_engine_duck_surface(rng):
    from pcmi_tpu.models.diffusion import CondUNet, DiffusionConfig, TiledDiffusionEngine

    cfg = DiffusionConfig(steps=3, tile=16, stride=12, img_channels=1,
                          train_timesteps=50)
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(8, 16, 16),
                                                   out_channels=1))
    img = rng.uniform(0.2, 0.8, (12, 14)).astype(np.float32)  # < tile size
    mask = np.zeros((12, 14), np.float32)
    mask[4:8, 4:8] = 1.0
    out = np.asarray(eng.restore(jnp.asarray(img), jnp.asarray(mask)).output)
    assert out.shape == (12, 14) and np.isfinite(out).all()
    enh = np.asarray(eng.enhance(jnp.asarray(img)).output)
    assert enh.shape == (12, 14) and np.isfinite(enh).all()
    # processors accept the engine through the registry surface
    from pcmi_tpu.pipelines.generative import ImageRestorationProcessor

    holes = img.copy()
    holes[5:7, 5:7] = np.nan
    res = ImageRestorationProcessor(eng, margin=1).process(holes)
    assert np.isfinite(res).all()
