"""Unit tests for shared ops vs NumPy/scipy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.ops.normalize import normalise_image, percentile_stretch
from pcmi_tpu.ops.filters import (
    box_filter,
    gaussian_filter,
    guided_filter,
    masked_guided_filter,
    local_entropy,
    gabor_bank,
    filter_bank_2d,
)
from pcmi_tpu.ops.morphology import (
    binary_dilation,
    binary_erosion,
    grey_erosion,
    distance_transform,
)
from pcmi_tpu.ops.warp import affine_warp, map_coordinates, warp_points_affine


def ref_normalise(img, nb=8):
    # NumPy port of reference processing.py:21-33 semantics
    values = img[img >= 0]
    med = np.median(values)
    mad = np.median(np.abs(values - med))
    lo, hi = med - nb * mad, med + nb * mad
    out = np.clip((img - lo) / (hi - lo), 0, 1)
    out[img < 0] = 0
    return out


def test_normalise_matches_numpy(rng):
    img = rng.normal(100.0, 25.0, (64, 64)).astype(np.float32)
    img[:4] = -1.0  # undefined sentinel rows
    out, mask = normalise_image(jnp.asarray(img))
    expected = ref_normalise(img)
    assert np.asarray(mask).sum() == (img >= 0).sum()
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-2)


def test_percentile_stretch_range(rng):
    img = rng.uniform(50, 500, (128, 128)).astype(np.float32)
    out = np.asarray(percentile_stretch(jnp.asarray(img)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # middle of distribution should spread over most of [0,1]
    assert out.std() > 0.2


def test_box_filter_matches_numpy(rng):
    img = rng.normal(size=(32, 32)).astype(np.float32)
    r = 2
    out = np.asarray(box_filter(jnp.asarray(img), r))
    padded = np.pad(img, r, mode="reflect")
    expected = np.zeros_like(img)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            expected += padded[dy : dy + 32, dx : dx + 32]
    expected /= (2 * r + 1) ** 2
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_gaussian_filter_preserves_mean(rng):
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    out = np.asarray(gaussian_filter(jnp.asarray(img), sigma=2.0))
    assert abs(out.mean() - img.mean()) < 1e-2
    assert out.std() < img.std()


def test_guided_filter_edge_preserving():
    # step edge should survive guided filtering but noise should shrink
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    noisy = img + np.random.default_rng(1).normal(0, 0.05, img.shape).astype(np.float32)
    out = np.asarray(guided_filter(jnp.asarray(noisy), jnp.asarray(noisy), 8, 1e-3))
    # edge magnitude preserved
    assert out[:, 40:].mean() - out[:, :24].mean() > 0.8
    # noise reduced away from edge
    assert out[:, :24].std() < noisy[:, :24].std()


def test_masked_guided_filter_fills_holes():
    img = np.linspace(0, 1, 64, dtype=np.float32)[None].repeat(64, 0)
    src = img.copy()
    mask = np.ones_like(img, bool)
    mask[20:30, 20:30] = False
    src[~mask] = 99.0  # garbage in hole
    out = np.asarray(
        masked_guided_filter(jnp.asarray(img), jnp.asarray(src), jnp.asarray(mask), 12)
    )
    assert abs(out[25, 25] - img[25, 25]) < 0.15


def test_binary_dilation_erosion(rng):
    mask = np.zeros((32, 32), bool)
    mask[16, 16] = True
    d = np.asarray(binary_dilation(jnp.asarray(mask), iterations=3))
    assert d[13:20, 13:20].all()
    assert not d[10, 10]
    e = np.asarray(binary_erosion(jnp.asarray(d), iterations=1))
    assert e.sum() < d.sum()


def test_grey_erosion_is_min_filter(rng):
    img = rng.uniform(size=(16, 16)).astype(np.float32)
    out = np.asarray(grey_erosion(jnp.asarray(img), 3))
    padded = np.pad(img, 1, mode="edge")
    # interior check vs naive min
    for y in range(2, 14):
        for x in range(2, 14):
            assert abs(out[y, x] - img[y - 1 : y + 2, x - 1 : x + 2].min()) < 1e-6


def test_distance_transform_monotone():
    mask = np.ones((32, 32), bool)
    mask[:, :1] = False
    d = np.asarray(distance_transform(jnp.asarray(mask), max_dist=16))
    assert d[16, 0] == 0
    assert d[16, 5] == pytest.approx(5, abs=1)
    assert d[16, 31] == 16


def test_affine_warp_identity_and_shift(rng):
    img = rng.uniform(size=(32, 32)).astype(np.float32)
    eye = jnp.asarray(np.eye(3, dtype=np.float32))
    out = np.asarray(affine_warp(jnp.asarray(img), eye, (32, 32)))
    np.testing.assert_allclose(out, img, atol=1e-5)
    # shift right by 3: out[y, x] = img[y, x-3]
    m = np.eye(3, dtype=np.float32)
    m[0, 2] = -3
    out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m), (32, 32)))
    np.testing.assert_allclose(out[:, 3:], img[:, :-3], atol=1e-5)


def test_map_coordinates_bilinear():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    v = map_coordinates(img, jnp.asarray([1.5]), jnp.asarray([1.5]))
    assert float(v[0]) == pytest.approx((5 + 6 + 9 + 10) / 4)


def test_warp_points_affine():
    m = np.array([[2.0, 0, 1], [0, 3.0, -2]], np.float32)
    pts = np.array([[1.0, 1.0], [0.0, 0.0]], np.float32)
    out = np.asarray(warp_points_affine(jnp.asarray(m), jnp.asarray(pts)))
    np.testing.assert_allclose(out, [[3, 1], [1, -2]], atol=1e-6)


def test_local_entropy_flat_vs_texture(rng):
    flat = np.full((32, 32), 0.5, np.float32)
    tex = rng.uniform(size=(32, 32)).astype(np.float32)
    e_flat = np.asarray(local_entropy(jnp.asarray(flat), radius=4))
    e_tex = np.asarray(local_entropy(jnp.asarray(tex), radius=4))
    assert e_tex.mean() > e_flat.mean() + 1.0


def test_gabor_bank_shape_and_response():
    bank = gabor_bank()
    assert bank.shape == (16, 31, 31)
    # vertical stripes respond to theta=0 (x-direction oscillation)
    img = np.tile(np.sin(np.arange(64) * 2 * np.pi / 8)[None], (64, 1)).astype(np.float32)
    resp = np.asarray(filter_bank_2d(jnp.asarray(img), bank))
    energy = np.abs(resp).mean(axis=(1, 2))
    assert energy.argmax() < 4  # one of the theta=0 filters


def test_masked_quantile_grid_accuracy(rng):
    """Two-stage grid quantile vs exact numpy, several q and distributions."""
    from pcmi_tpu.ops.normalize import masked_quantile_grid

    for dist in ("uniform", "normal", "lognormal"):
        x = getattr(rng, dist)(size=(128, 256)).astype(np.float32)
        mask = rng.uniform(size=x.shape) > 0.25
        lo, hi = float(x[mask].min()), float(x[mask].max())
        for q in (0.02, 0.5, 0.98):
            got = float(masked_quantile_grid(
                jnp.asarray(x), jnp.asarray(mask), lo, hi, q))
            exact = float(np.quantile(x[mask], q))
            # resolution (hi-lo)/64**2 plus interpolation slack
            assert abs(got - exact) <= (hi - lo) / 64**2 + 5e-3 * (hi - lo), (
                dist, q, got, exact)


def test_masked_quantile_grid_degenerate():
    from pcmi_tpu.ops.normalize import masked_quantile_grid

    # constant data: every quantile is the constant
    x = jnp.full((32, 32), 7.5)
    m = jnp.ones((32, 32), bool)
    assert abs(float(masked_quantile_grid(x, m, 7.5, 7.5, 0.5)) - 7.5) < 1e-5
    # heavy ties at the minimum: median = min
    x2 = np.full((64, 64), 1.0, np.float32)
    x2[:8] = 5.0
    got = float(masked_quantile_grid(jnp.asarray(x2), m.repeat(2, 0).repeat(2, 1),
                                     1.0, 5.0, 0.5))
    assert abs(got - 1.0) < (5.0 - 1.0) / 64
