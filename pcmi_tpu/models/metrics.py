"""Image quality metrics (jittable): PSNR and SSIM.

The reference evaluates its generative components visually (notebook cells
43-45 zoomed panels); the rebuild's quality gates are numeric — SR must
beat bicubic PSNR, inpainting must beat the diffusion prefill
(``bench_generative.py``, ``tests/test_models.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, mask=None,
         peak: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB; optional pixel mask (e.g. in-hole)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    se = (pred - target) ** 2
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(jnp.float32), se.shape)
        mse = jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        mse = jnp.mean(se)
    return 10.0 * jnp.log10(peak**2 / jnp.maximum(mse, 1e-12))


@partial(jax.jit, static_argnames=("window", "peak"))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, window: int = 7,
         peak: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over (..., H, W, C) images, uniform window (Wang 2004)."""
    from pcmi_tpu.ops.filters import box_filter

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    r = window // 2
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2

    def f(img):
        # box_filter works on (H, W) / (H, W, C); vmap any leading batch
        if img.ndim == 4:
            return jax.vmap(lambda a: box_filter(a, r))(img)
        return box_filter(img, r)

    mx = f(x)
    my = f(y)
    vx = f(x * x) - mx * mx
    vy = f(y * y) - my * my
    cxy = f(x * y) - mx * my
    s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2))
    return jnp.mean(s)
