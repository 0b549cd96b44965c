"""Data-parallel training parity: the sharded step equals the local step."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pcmi_tpu.models.training import (
    InpaintGANTrainer,
    InpaintTrainConfig,
    data_parallel_step,
)
from pcmi_tpu.models.unet import InpaintUNet, PatchDiscriminator
from pcmi_tpu.viewer import add_layers


def test_dp_gan_step_matches_single_device(rng):
    trainer = InpaintGANTrainer(
        InpaintTrainConfig(compute_dtype="float32"),
        generator=InpaintUNet(widths=(8, 16, 32)),
        discriminator=PatchDiscriminator(widths=(8, 16, 32, 32)),
    )
    batch = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(3)
    state = trainer.init(jax.random.PRNGKey(0), batch)

    # single-device reference
    _, m_ref = trainer.train_step(state, batch, key)

    # 8-way data parallel: GSPMD all-reduce must reproduce the same metrics
    mesh = Mesh(np.array(jax.devices()), ("data",))
    dp = data_parallel_step(trainer.train_step, mesh)
    _, m_dp = dp(state, batch, key)

    for k in ("d_loss", "g_loss", "rec"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_ref[k]),
                                   rtol=2e-4, atol=2e-5)


class _FakeViewer:
    def __init__(self):
        self.calls = []

    def add_image(self, data, **params):
        self.calls.append(("image", data.shape, params))

    def add_points(self, data, **params):
        self.calls.append(("points", data.shape, params))


def test_add_layers_dispatches_by_kind(rng):
    layers = [
        (rng.normal(size=(8, 8)), {"name": "a"}, "image"),
        (rng.normal(size=(5, 3)), {"name": "b", "size": 1}, "points"),
    ]
    v = _FakeViewer()
    add_layers(v, layers)
    assert [c[0] for c in v.calls] == ["image", "points"]
    assert v.calls[0][2]["name"] == "a"


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    """save/restore of a full GAN state (params + both optimizers) is exact
    (the reference resumes torch .pt checkpoints; notebook cell 26)."""
    import os

    from pcmi_tpu.models.training import restore_checkpoint, save_checkpoint

    trainer = InpaintGANTrainer(
        InpaintTrainConfig(compute_dtype="float32"),
        generator=InpaintUNet(widths=(8, 16, 32)),
        discriminator=PatchDiscriminator(widths=(8, 16, 32, 32)),
    )
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    state = trainer.init(jax.random.PRNGKey(0), img)
    state, _ = trainer.train_step(state, img, jax.random.PRNGKey(1))
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state)
    back = restore_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training resumes from the restored state
    back2, metrics = trainer.train_step(back, img, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["g_loss"]))
