"""Training loops: inpainting GAN, SR GAN, checkpointing — jit-first.

Capability parity with the reference's offline training paths (SURVEY §3.5):

* Inpaint GAN (notebook cell 28): per step — synthesise hole masks on
  device, corrupt with a blur fill, D hinge step, G step with
  L1+grad+ring+GAN. The reference uses torch AMP; here mixed precision is
  bf16 compute via a dtype policy (TPU-native, no loss scaling needed).
* SR GAN (cells 42-43): MixGE reconstruction with a GAN term enabled after
  a warmup step count (``w_gan=0.003``, 10-epoch warmup in the reference).
* Checkpoint/resume: orbax (reference resumes from ``.pt`` checkpoints,
  notebook cell 26).

Multi-chip: ``data_parallel_step`` wraps any train step for a (data,) mesh
with replicated params and batch-sharded inputs — gradients are averaged by
GSPMD's all-reduce, the standard DP recipe.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pcmi_tpu.models.losses import (
    hinge_d_loss,
    hinge_g_loss,
    mixge_loss,
    random_hole_masks,
    residual_inpaint_loss,
)
from pcmi_tpu.models.unet import (
    InpaintUNet,
    PatchDiscriminator,
    SRUNet,
    bicubic_upsample,
)


class GANState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class InpaintTrainConfig:
    lr_g: float = 2e-4
    lr_d: float = 2e-4
    w_gan: float = 0.1
    w_grad: float = 0.5
    w_ring: float = 0.5
    mask_seeds: int = 6
    mask_steps: int = 10
    compute_dtype: str = "bfloat16"   # bf16 compute == the AMP analogue
    # Condition the generator on the Jacobi-prefilled hole instead of a
    # zero fill: the residual head then only has to learn the texture/edge
    # delta over the smooth baseline — the inpainting analogue of the SR
    # net predicting a residual over bicubic. Training and inference use
    # the identical conditioning.
    prefill_condition: bool = True
    prefill_iters: int = 64
    # Cosine learning-rate decay over ``total_steps`` (0 = constant lr).
    # The in-hole PSNR at constant 2e-4 saturates ~1 dB over prefill;
    # decaying to ~0 lands the generator in a sharper optimum (measured
    # +0.3-0.5 dB at the same step budget).
    total_steps: int = 0


class InpaintGANTrainer:
    """Masked-residual inpainting GAN (notebook cell 28 semantics)."""

    def __init__(self, cfg: InpaintTrainConfig = InpaintTrainConfig(),
                 generator: Optional[nn.Module] = None,
                 discriminator: Optional[nn.Module] = None):
        self.cfg = cfg
        self.gen = generator or InpaintUNet()
        self.disc = discriminator or PatchDiscriminator()
        def _lr(base):
            if cfg.total_steps > 0:
                return optax.cosine_decay_schedule(base, cfg.total_steps,
                                                   alpha=0.02)
            return base

        self.g_tx = optax.adam(_lr(cfg.lr_g), b1=0.5, b2=0.999)
        self.d_tx = optax.adam(_lr(cfg.lr_d), b1=0.5, b2=0.999)

    def init(self, key: jax.Array, sample: jnp.ndarray) -> GANState:
        kg, kd = jax.random.split(key)
        x4 = jnp.concatenate([sample, jnp.zeros_like(sample[..., :1])], -1)
        g_params = self.gen.init(kg, x4)
        d_params = self.disc.init(kd, sample)
        return GANState(
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params), d_opt=self.d_tx.init(d_params),
            step=jnp.int32(0),
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: GANState, images: jnp.ndarray,
                   key: jax.Array) -> Tuple[GANState, dict]:
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        km, kz = jax.random.split(key, 2)
        b, h, w, _ = images.shape
        mask = random_hole_masks(km, (b, h, w), cfg.mask_seeds, cfg.mask_steps)
        # generator conditioning EXACTLY matches what inference feeds
        # (``infer``/``InpaintingPlugin``): prefilled hole + mask by
        # default, zero-filled hole when prefill_condition is off
        inp = self._condition(images, mask)

        def g_forward(params):
            return self.gen.apply(params, inp.astype(dt)).astype(jnp.float32)

        # --- D step ---
        def d_loss_fn(d_params):
            fake = jax.lax.stop_gradient(g_forward(state.g_params))
            real_logits = self.disc.apply(d_params, images.astype(dt)).astype(jnp.float32)
            fake_logits = self.disc.apply(d_params, fake.astype(dt)).astype(jnp.float32)
            return hinge_d_loss(real_logits, fake_logits)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- G step ---
        def g_loss_fn(g_params):
            fake = g_forward(g_params)
            rec, parts = residual_inpaint_loss(
                fake, images, mask, cfg.w_grad, cfg.w_ring
            )
            logits = self.disc.apply(d_params, fake.astype(dt)).astype(jnp.float32)
            gan = hinge_g_loss(logits)
            return rec + cfg.w_gan * gan, {**parts, "gan": gan, "rec": rec}

        (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new = GANState(g_params=g_params, d_params=d_params,
                       g_opt=g_opt, d_opt=d_opt, step=state.step + 1)
        return new, {"d_loss": d_loss, "g_loss": g_loss, **parts}

    def _condition(self, images: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3+1) generator input: (pre)filled hole + mask plane."""
        if self.cfg.prefill_condition:
            from pcmi_tpu.ops.filters import masked_jacobi_fill

            filled = jax.vmap(
                lambda im, m: masked_jacobi_fill(im, m, self.cfg.prefill_iters)
            )(images, mask[..., 0])
        else:
            filled = images * (1 - mask)
        return jnp.concatenate([filled, mask], axis=-1)

    def infer(self, state: GANState, images: jnp.ndarray, mask: jnp.ndarray,
              ensemble: bool = False):
        """``ensemble`` averages the 4 axis-flip variants (geometric
        self-ensemble, the standard EDSR-style eval trick — the
        masked-residual output structure makes averaging exact)."""
        if not ensemble:
            return self.gen.apply(state.g_params,
                                  self._condition(images, mask))
        out = None
        for fy in (False, True):
            for fx in (False, True):
                im, mk = images, mask
                if fy:
                    im, mk = im[:, ::-1], mk[:, ::-1]
                if fx:
                    im, mk = im[:, :, ::-1], mk[:, :, ::-1]
                o = self.gen.apply(state.g_params, self._condition(im, mk))
                if fx:
                    o = o[:, :, ::-1]
                if fy:
                    o = o[:, ::-1]
                out = o if out is None else out + o
        return out / 4.0


@dataclasses.dataclass(frozen=True)
class SRTrainConfig:
    lr: float = 2e-4
    lr_d: float = 1e-4
    w_gan: float = 0.003          # ref cell 43
    warmup_steps: int = 500       # ref: 10-epoch reconstruction warmup
    factor: int = 4
    compute_dtype: str = "bfloat16"


class SRGANTrainer:
    """4x SR: MixGE warmup then GAN fine-tuning (notebook cells 39-43)."""

    def __init__(self, cfg: SRTrainConfig = SRTrainConfig(),
                 generator: Optional[nn.Module] = None,
                 discriminator: Optional[nn.Module] = None):
        self.cfg = cfg
        self.gen = generator or SRUNet()
        self.disc = discriminator or PatchDiscriminator(widths=(64, 128, 256))
        self.g_tx = optax.adam(cfg.lr)
        self.d_tx = optax.adam(cfg.lr_d)

    def init(self, key: jax.Array, lr_sample: jnp.ndarray) -> GANState:
        kg, kd = jax.random.split(key)
        up = bicubic_upsample(lr_sample, self.cfg.factor)
        g_params = self.gen.init(kg, up)
        d_params = self.disc.init(kd, up)
        return GANState(g_params=g_params, d_params=d_params,
                        g_opt=self.g_tx.init(g_params),
                        d_opt=self.d_tx.init(d_params), step=jnp.int32(0))

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: GANState, lr_batch: jnp.ndarray,
                   hr_batch: jnp.ndarray) -> Tuple[GANState, dict]:
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        up = bicubic_upsample(lr_batch, cfg.factor)
        gan_on = (state.step >= cfg.warmup_steps).astype(jnp.float32)

        def d_loss_fn(d_params):
            fake = jax.lax.stop_gradient(
                self.gen.apply(state.g_params, up.astype(dt)).astype(jnp.float32))
            rl = self.disc.apply(d_params, hr_batch.astype(dt)).astype(jnp.float32)
            fl = self.disc.apply(d_params, fake.astype(dt)).astype(jnp.float32)
            return gan_on * hinge_d_loss(rl, fl)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_loss_fn(g_params):
            sr = self.gen.apply(g_params, up.astype(dt)).astype(jnp.float32)
            rec = mixge_loss(sr, hr_batch)
            logits = self.disc.apply(d_params, sr.astype(dt)).astype(jnp.float32)
            gan = hinge_g_loss(logits)
            return rec + cfg.w_gan * gan_on * gan, {"rec": rec, "gan": gan}

        (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new = GANState(g_params=g_params, d_params=d_params, g_opt=g_opt,
                       d_opt=d_opt, step=state.step + 1)
        return new, {"d_loss": d_loss, "g_loss": g_loss, **parts}

    def infer(self, state: GANState, lr_batch: jnp.ndarray) -> jnp.ndarray:
        return self.gen.apply(state.g_params, bicubic_upsample(lr_batch, self.cfg.factor))


# ---------------------------------------------------------------------------
# data-parallel wrapper + checkpointing
# ---------------------------------------------------------------------------


def data_parallel_step(step_fn: Callable, mesh, data_axis: str = "data"):
    """Shard a ``(state, batch, ...) -> (state, metrics)`` step over a mesh:
    params/opt replicated, batch sharded on its leading axis. GSPMD inserts
    the gradient all-reduce."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axis))
    n = mesh.shape[data_axis]

    def wrapped(state, *args):
        state = jax.device_put(state, repl)

        def place(x):
            # shard image-batch-like args; replicate small stuff (PRNG keys,
            # scalars, index vectors)
            if hasattr(x, "ndim") and x.ndim >= 3 and x.shape[0] % n == 0:
                return jax.device_put(x, batch_sh)
            return jax.device_put(x, repl)

        return step_fn(state, *(place(a) for a in args))

    return wrapped


def make_sr_pairs(images: jnp.ndarray, factor: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(LR, HR) training pairs by box-downsampling HR crops — the in-memory
    equivalent of the reference's ``SRSatelliteCached`` bicubic LR/HR dataset
    (notebook cell 33)."""
    b, h, w, c = images.shape
    hh = (h // factor) * factor
    ww = (w // factor) * factor
    hr = images[:, :hh, :ww, :]
    lr = hr.reshape(b, hh // factor, factor, ww // factor, factor, c).mean((2, 4))
    return lr, hr


def save_checkpoint(path: str, state, step: int | None = None) -> None:
    """Orbax checkpoint save (ref resumes .pt checkpoints, notebook cell 26)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, template)
