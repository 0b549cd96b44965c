"""Models layer: U-Nets, losses, GAN/DIP/diffusion training smoke + overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcmi_tpu.models.unet import (
    DIPUNet,
    InpaintUNet,
    PatchDiscriminator,
    SRUNet,
    bicubic_upsample,
)
from pcmi_tpu.models.losses import (
    boundary_ring_mask,
    hinge_d_loss,
    hinge_g_loss,
    masked_l1,
    mixge_loss,
    random_hole_masks,
    residual_inpaint_loss,
)
from pcmi_tpu.models.training import (
    InpaintGANTrainer,
    InpaintTrainConfig,
    SRGANTrainer,
    SRTrainConfig,
)
from pcmi_tpu.models.dip import DIPConfig, DIPEngine


SMALL = dict(widths=(8, 16, 32))


def test_inpaint_unet_residual_semantics(rng):
    model = InpaintUNet(**SMALL)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    mask = jnp.zeros((2, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.concatenate([x, mask], -1))
    out = model.apply(params, jnp.concatenate([x, mask], -1))
    # zero mask -> output == input exactly (residual only inside the hole)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    mask2 = mask.at[:, 8:16, 8:16, :].set(1.0)
    out2 = model.apply(params, jnp.concatenate([x, mask2], -1))
    diff = np.abs(np.asarray(out2) - np.asarray(x))
    assert diff[:, :8].max() < 1e-6      # untouched outside the hole


def test_patch_discriminator_output_shape(rng):
    d = PatchDiscriminator(widths=(8, 16, 32, 32))
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    params = d.init(jax.random.PRNGKey(0), x)
    logits = d.apply(params, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 64  # patch logits, not per-pixel


def test_sr_unet_factor_and_residual(rng):
    m = SRUNet(widths=(8, 16, 32))
    lr = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    up = bicubic_upsample(lr, 4)
    assert up.shape == (1, 64, 64, 3)
    params = m.init(jax.random.PRNGKey(0), up)
    out = m.apply(params, up)
    assert out.shape == up.shape


def test_losses_behave(rng):
    pred = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    target = pred + 0.1
    mask = jnp.zeros((2, 16, 16, 1)).at[:, 4:8, 4:8].set(1.0)
    assert abs(float(masked_l1(pred, target, mask)) - 0.1) < 1e-5
    total, parts = residual_inpaint_loss(pred, target, mask)
    assert float(total) > 0 and set(parts) == {"hole_l1", "grad", "ring"}
    ring = boundary_ring_mask(mask, width=2)
    # ring surrounds but excludes the hole
    assert float(jnp.sum(ring * mask)) == 0 and float(jnp.sum(ring)) > 0
    assert float(mixge_loss(pred, target)) > 0
    # hinge: perfect D -> low loss
    assert float(hinge_d_loss(jnp.full((4,), 2.0), jnp.full((4,), -2.0))) == 0
    assert float(hinge_g_loss(jnp.full((4,), 3.0))) == -3.0


def test_random_hole_masks_connected(rng):
    masks = random_hole_masks(jax.random.PRNGKey(1), (2, 64, 64), n_seeds=4,
                              steps=8)
    m = np.asarray(masks)
    assert m.shape == (2, 64, 64, 1)
    frac = m.mean(axis=(1, 2, 3))
    assert (frac > 0.002).all() and (frac < 0.5).all()


@pytest.mark.slow
def test_inpaint_gan_overfits_single_image(rng):
    cfg = InpaintTrainConfig(compute_dtype="float32")
    trainer = InpaintGANTrainer(
        cfg,
        generator=InpaintUNet(widths=(8, 16, 32)),
        discriminator=PatchDiscriminator(widths=(8, 16, 32, 32)),
    )
    img = jnp.asarray(
        np.tile(np.linspace(0, 1, 32, dtype=np.float32)[None, :, None], (32, 1, 3))
    )[None]
    state = trainer.init(jax.random.PRNGKey(0), img)
    losses = []
    # zero-fill conditioning (inference parity) is a harder task than the
    # old blur-fill; a few more steps show the same convergence
    for i in range(100):
        state, metrics = trainer.train_step(state, img, jax.random.PRNGKey(i))
        losses.append(float(metrics["rec"]))
    assert np.mean(losses[-10:]) < 0.7 * np.mean(losses[:10])


def test_sr_trainer_warmup_disables_gan(rng):
    cfg = SRTrainConfig(warmup_steps=1000, compute_dtype="float32")
    trainer = SRGANTrainer(
        cfg,
        generator=SRUNet(widths=(8, 16, 32)),
        discriminator=PatchDiscriminator(widths=(8, 16, 32)),
    )
    lr = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    state = trainer.init(jax.random.PRNGKey(0), lr)
    state, m = trainer.train_step(state, lr, hr)
    assert float(m["d_loss"]) == 0.0  # gan off during warmup
    state, m2 = trainer.train_step(state, lr, hr)
    assert np.isfinite(float(m2["g_loss"]))


@pytest.mark.slow
def test_dip_fills_hole_on_smooth_image():
    cfg = DIPConfig(iters=150, noise_channels=8)
    engine = DIPEngine(cfg)
    engine.model = DIPUNet(widths=(8, 16, 16))
    img = np.tile(np.linspace(0.2, 0.8, 48, dtype=np.float32)[None, :], (48, 1))
    mask = np.zeros((48, 48), np.float32)
    mask[20:28, 20:28] = 1.0
    res = engine.restore(jnp.asarray(img), jnp.asarray(mask))
    out = np.asarray(res.output)
    # known pixels untouched
    np.testing.assert_allclose(out[mask < 0.5], img[mask < 0.5], atol=1e-6)
    # hole roughly matches the smooth gradient
    err = np.abs(out[20:28, 20:28] - img[20:28, 20:28])
    assert err.mean() < 0.15
    # loss decreased
    losses = np.asarray(res.losses)
    assert losses[-10:].mean() < 0.5 * losses[:10].mean()


@pytest.mark.slow
def test_diffusion_train_loss_decreases_and_inpaint_runs(rng):
    from pcmi_tpu.models.diffusion import DiffusionConfig, TiledDiffusionEngine
    import optax

    cfg = DiffusionConfig(steps=4, tile=16, stride=12, img_channels=1,
                          train_timesteps=100)
    from pcmi_tpu.models.diffusion import CondUNet
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(8, 16, 16),
                                                   out_channels=1))
    params = eng.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    imgs = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 1)), jnp.float32)
    masks = jnp.zeros((4, 16, 16, 1)).at[:, 4:10, 4:10].set(1.0)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(eng.train_step_loss)(params, imgs, masks, key)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for i in range(40):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    hole = jnp.zeros((24, 24, 1)).at[6:12, 6:12].set(1.0)
    img = jnp.asarray(rng.uniform(-1, 1, (24, 24, 1)), jnp.float32)
    for method in ("dpmpp", "ddim"):
        out = eng.inpaint(params, img, hole, method=method)
        assert out.shape == (24, 24, 1) and np.isfinite(np.asarray(out)).all()
        # known region locked exactly
        np.testing.assert_allclose(np.asarray(out)[~np.asarray(hole[..., 0], bool)],
                                   np.asarray(img)[~np.asarray(hole[..., 0], bool)])

    # Karras sigma schedule: strictly decreasing, ends at zero
    from pcmi_tpu.models.diffusion import karras_sigmas

    sig, t_idx = karras_sigmas(cfg, 8)
    s = np.asarray(sig)
    assert (np.diff(s[:-1]) < 0).all() and s[-1] == 0.0
    assert (np.diff(np.asarray(t_idx)) <= 0).all()


@pytest.mark.slow
def test_diffusion_edge_conditioning(rng):
    """ControlNet-canny analogue: edge channel joins the conditioning."""
    import optax

    from pcmi_tpu.models.diffusion import (
        CondUNet,
        DiffusionConfig,
        TiledDiffusionEngine,
        sobel_edges,
    )

    img = jnp.asarray(rng.uniform(-1, 1, (16, 16, 1)), jnp.float32)
    mask = jnp.zeros((16, 16, 1)).at[4:10, 4:10].set(1.0)
    e = np.asarray(sobel_edges(img, mask))
    assert e.shape == (16, 16, 1)
    assert (e[np.asarray(mask[..., 0], bool)] == 0).all()  # hole zeroed

    cfg = DiffusionConfig(steps=3, tile=16, stride=12, img_channels=1,
                          train_timesteps=50, edge_conditioning=True)
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(8, 16, 16),
                                                   out_channels=1))
    params = eng.init_params(jax.random.PRNGKey(0))
    loss = eng.train_step_loss(params, img[None], mask[None],
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = eng.inpaint(params, img, mask)
    assert out.shape == (16, 16, 1) and np.isfinite(np.asarray(out)).all()
