"""Component tests: saliency, restoration (synthetic-degradation recovery)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcmi_tpu.pipelines.saliency import (
    SaliencyDetector,
    extract_boxes,
    label_components,
    spectral_residual_map,
)
from pcmi_tpu.pipelines.restoration import (
    RestorationEngine,
    RestorationPlugin,
    add_degradation,
    dark_channel_dehaze,
    nlm_denoise,
)


def _textured_scene(rng, h=256, w=256):
    """Low-frequency background + one small bright salient blob."""
    base = rng.normal(0, 0.02, (h // 16 + 2, w // 16 + 2))
    ys = np.linspace(0, base.shape[0] - 2, h)
    xs = np.linspace(0, base.shape[1] - 2, w)
    img = base[np.round(ys).astype(int)][:, np.round(xs).astype(int)]
    img = img - img.min() + 0.2
    img[120:136, 60:76] += 0.8  # salient object
    return img.astype(np.float32)


def test_saliency_highlights_object(rng):
    img = _textured_scene(rng)
    sal = np.asarray(spectral_residual_map(jnp.asarray(img), tile=256, pad=32))
    assert sal.shape == img.shape
    inside = sal[118:138, 58:78].mean()
    outside = np.delete(sal.reshape(-1), 0).mean()
    assert inside > 3 * outside


def test_label_components_and_boxes():
    mask = np.zeros((64, 64), bool)
    mask[5:15, 5:15] = True
    mask[40:44, 50:60] = True
    labels = np.asarray(label_components(jnp.asarray(mask)))
    ids = np.unique(labels[labels >= 0])
    assert len(ids) == 2
    boxes = extract_boxes(labels, min_size=10)
    assert sorted(boxes) == [(5, 5, 15, 15), (40, 50, 44, 60)]


def test_saliency_plugin_layers(rng):
    img = _textured_scene(rng)
    layers = SaliencyDetector(tile=256, pad=32).run(img)
    kinds = [k for _, _, k in layers]
    assert kinds[0] == "image" and kinds[1] == "image"
    assert "shapes" in kinds  # the blob must be detected
    rects = layers[-1][0]
    # one of the rectangles covers the planted blob centre
    centers = rects.mean(axis=1)
    assert any(abs(cy - 128) < 16 and abs(cx - 68) < 16 for cy, cx in centers)


def test_nlm_denoise_reduces_noise(rng):
    clean = np.tile(np.linspace(0.2, 0.8, 64), (64, 1)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    den = np.asarray(nlm_denoise(jnp.asarray(noisy), h=0.08, template=5, search=9))
    assert np.abs(den - clean).mean() < 0.55 * np.abs(noisy - clean).mean()


def test_dehaze_recovers_contrast(rng):
    clean = np.zeros((96, 96), np.float32)
    clean[:] = np.linspace(0.1, 0.7, 96)[None, :]
    clean[30:60, 30:60] = 0.05
    hazy, t_true = add_degradation(jnp.asarray(clean), jax.random.PRNGKey(0),
                                   haze_strength=0.7, noise_sigma=0.0)
    res = dark_channel_dehaze(hazy, erosion=15)
    c_hazy = float(jnp.std(hazy))
    c_out = float(jnp.std(res.radiance))
    assert c_out > 1.2 * c_hazy          # contrast restored
    assert float(res.transmission.min()) >= 0.1
    assert float(res.transmission.max()) <= 1.0


def test_restoration_plugin_layer_contract(rng):
    img = (_textured_scene(rng, 96, 96) * 255).astype(np.float32)
    layers = RestorationPlugin().run(img)
    names = [p["name"] for _, p, _ in layers]
    assert names == ["input", "denoised", "dehazed", "restored", "transmission"]
    assert all(k == "image" for _, _, k in layers)
    # output scale follows the input scale
    assert layers[3][0].max() > 1.5
