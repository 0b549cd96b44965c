"""Training losses from the reference's notebook, as pure JAX functions.

Sources (reference ``members/stan/Super_resolution_and_inpainting_Stan.ipynb``):

* cell 20 ``residual_inpaint_loss`` — masked L1 + image-gradient L1 + a
  boundary-ring term that weights the annulus just outside the hole.
* cell 28 — hinge GAN losses (D: relu(1∓logits); G: −mean logits).
* cell 39 ``MixGE`` — MSE + 0.1 · gradient-difference (SR training).
* cell 15 — random connected hole masks grown by max-pool frontier steps
  (the fault-injection path for inpainting training).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _grad_xy(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    return dy, dx


def masked_l1(pred, target, mask):
    """Mean |pred - target| over mask pixels (mask broadcast over channels)."""
    m = mask
    num = jnp.sum(jnp.abs(pred - target) * m)
    return num / jnp.maximum(jnp.sum(m) * pred.shape[-1] / mask.shape[-1], 1.0)


def gradient_l1(pred, target):
    py, px = _grad_xy(pred)
    ty, tx = _grad_xy(target)
    return jnp.mean(jnp.abs(py - ty)) + jnp.mean(jnp.abs(px - tx))


def boundary_ring_mask(mask: jnp.ndarray, width: int = 4) -> jnp.ndarray:
    """Annulus of ``width`` px just outside the hole (notebook cell 20)."""
    m = mask[..., 0] if mask.ndim == 4 else mask
    grown = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max,
        (1, 2 * width + 1, 2 * width + 1), (1, 1, 1), "SAME",
    ) if m.ndim == 3 else None
    if grown is None:
        raise ValueError("mask must be (B, H, W) or (B, H, W, 1)")
    ring = (grown > 0.5) & (m < 0.5)
    return ring[..., None].astype(jnp.float32)


def residual_inpaint_loss(pred, target, mask, w_grad=0.5, w_ring=0.5,
                          ring_width=4):
    """Masked L1 + gradient + boundary-ring loss (notebook cell 20)."""
    hole = masked_l1(pred, target, mask)
    grad = gradient_l1(pred, target)
    ring = masked_l1(pred, target, boundary_ring_mask(mask, ring_width))
    return hole + w_grad * grad + w_ring * ring, {
        "hole_l1": hole, "grad": grad, "ring": ring,
    }


def hinge_d_loss(real_logits, fake_logits):
    """D hinge loss (notebook cell 28)."""
    return (
        jnp.mean(jax.nn.relu(1.0 - real_logits))
        + jnp.mean(jax.nn.relu(1.0 + fake_logits))
    )


def hinge_g_loss(fake_logits):
    return -jnp.mean(fake_logits)


def mixge_loss(pred, target, w_grad: float = 0.1):
    """MSE + w·gradient-difference — SR reconstruction loss (cell 39)."""
    mse = jnp.mean((pred - target) ** 2)
    py, px = _grad_xy(pred)
    ty, tx = _grad_xy(target)
    ge = jnp.mean((py - ty) ** 2) + jnp.mean((px - tx) ** 2)
    return mse + w_grad * ge


@partial(jax.jit, static_argnames=("shape", "n_seeds", "steps"))
def random_hole_masks(
    key: jax.Array,
    shape: Tuple[int, int, int],
    n_seeds: int = 6,
    steps: int = 10,
    p_grow: float = 0.7,
) -> jnp.ndarray:
    """Connected random blob masks via max-pool frontier growth
    (notebook cell 15): seed a few pixels per image, then repeatedly dilate
    and keep grown pixels with probability ``p_grow``. Returns (B, H, W, 1)
    float 1=hole."""
    b, h, w = shape
    k1, k2 = jax.random.split(key)
    seeds_y = jax.random.randint(k1, (b, n_seeds), h // 8, 7 * h // 8)
    seeds_x = jax.random.randint(k2, (b, n_seeds), w // 8, 7 * w // 8)
    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    mask = jnp.zeros((b, h, w), jnp.float32)
    for i in range(n_seeds):
        mask = jnp.maximum(
            mask,
            ((ys == seeds_y[:, i, None, None]) &
             (xs == seeds_x[:, i, None, None])).astype(jnp.float32),
        )

    def grow(carry, k):
        m = carry
        grown = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )
        keep = jax.random.uniform(k, m.shape) < p_grow
        new = jnp.maximum(m, grown * keep)
        return new, None

    keys = jax.random.split(jax.random.fold_in(key, 7), steps)
    mask, _ = jax.lax.scan(grow, mask, keys)
    return mask[..., None]
