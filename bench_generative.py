"""Generative quality benchmark: SR vs bicubic, inpaint vs prefill, DIP.

Prints ONE JSON line:
  {"metric": "generative_quality", "value": <SR PSNR gain dB>, ...}

The reference ships pretrained weights (SD inpainting ``satdiff.py:90-121``,
SR checkpoint ``stan/plugin.py:228-245``) but records no numbers; these
gates are the rebuild's numeric replacement for its visual notebook
evaluation (cells 43-45):

* SR: the trained SRUNet must beat bicubic PSNR on held-out scenes.
* Inpaint: the trained InpaintUNet must beat the diffusion prefill
  (the Telea stand-in) on in-hole PSNR, held-out scenes.
* DIP: the engine must improve noisy input PSNR (no training data at all).

Run: python bench_generative.py [--sr-steps N] [--inpaint-steps N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_scene_rgb(key, size: int = 96):
    """Satellite-like RGB with LEARNABLE structure: Voronoi field parcels,
    roads, buildings with shadows, mild texture.

    Purely random high-frequency texture is information-theoretically
    unrecoverable — on it bicubic/smooth-fill are near-optimal and no model
    can beat them. Parcel boundaries, road lines and building edges are the
    structure real imagery has and learned SR/inpainting exploit.
    """
    import jax
    import jax.numpy as jnp

    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)

    # field parcels: nearest-seed (Voronoi) labels -> per-parcel reflectance
    k = 12
    seeds = rng.uniform(0, size, (k, 2)).astype(np.float32)
    d2 = (ys[..., None] - seeds[:, 0]) ** 2 + (xs[..., None] - seeds[:, 1]) ** 2
    lab = np.argmin(d2, axis=-1)
    refl = rng.uniform(0.2, 0.8, k).astype(np.float32)
    g = refl[lab]

    # roads: 2-3 straight dark lines
    for _ in range(rng.integers(2, 4)):
        p = rng.uniform(0, size, 2)
        th = rng.uniform(0, np.pi)
        n_ = np.array([np.sin(th), -np.cos(th)])
        dist = np.abs((ys - p[0]) * n_[0] + (xs - p[1]) * n_[1])
        g = np.where(dist < 1.5, 0.12, g)

    # buildings: bright rectangles with a dark offset shadow
    for _ in range(rng.integers(3, 7)):
        cy, cx = rng.uniform(8, size - 8, 2)
        hh, ww = rng.uniform(3, 9, 2)
        b = (np.abs(ys - cy) < hh) & (np.abs(xs - cx) < ww)
        s = (np.abs(ys - cy - hh) < 2) & (np.abs(xs - cx - ww / 2) < ww)
        g = np.where(s, 0.08, g)
        g = np.where(b, 0.85, g)

    g = g + rng.normal(0, 0.02, g.shape).astype(np.float32)
    rgb = np.stack([0.92 * g + 0.04, g, 0.85 * g + 0.06], axis=-1)
    return jnp.asarray(np.clip(rgb, 0.0, 1.0), jnp.float32)


def _batch(key, n, size):
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(key, n)
    return jnp.stack([make_scene_rgb(k, size) for k in keys])


def make_pool(key, n_scenes: int, size: int):
    """Pre-generated scene pool; training samples augmented batches from it
    on device (scene synthesis has a host-side building loop — per-step
    generation would be host-bound)."""
    return _batch(key, n_scenes, size)


def sample_batch(key, pool, batch: int):
    import jax
    import jax.numpy as jnp

    ki, kf, kr = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (batch,), 0, pool.shape[0])
    out = pool[idx]
    flip = jax.random.bernoulli(kf, 0.5, (batch,))
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1], out)
    rot = jax.random.bernoulli(kr, 0.5, (batch,))
    out = jnp.where(rot[:, None, None, None],
                    jnp.transpose(out, (0, 2, 1, 3)), out)
    return out


def bench_sr(steps: int, size: int = 96, batch: int = 8, seed: int = 0):
    import jax

    from pcmi_tpu.models.metrics import psnr
    from pcmi_tpu.models.training import SRGANTrainer, SRTrainConfig, make_sr_pairs
    from pcmi_tpu.models.unet import bicubic_upsample

    trainer = SRGANTrainer(SRTrainConfig(warmup_steps=max(steps, 1)))
    key = jax.random.PRNGKey(seed)
    pool = make_pool(key, 48, size)
    lr, hr = make_sr_pairs(pool[:batch])
    state = trainer.init(jax.random.PRNGKey(seed + 1), lr)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        hr_b = sample_batch(sub, pool, batch)
        lr_b, hr_b = make_sr_pairs(hr_b)
        state, m = trainer.train_step(state, lr_b, hr_b)
    train_s = time.perf_counter() - t0

    # held-out evaluation
    ek = jax.random.PRNGKey(50_000 + seed)
    hr_t = _batch(ek, batch, size)
    lr_t, hr_t = make_sr_pairs(hr_t)
    sr = trainer.infer(state, lr_t)
    up = bicubic_upsample(lr_t, trainer.cfg.factor)
    p_sr = float(psnr(sr, hr_t))
    p_bi = float(psnr(up, hr_t))
    return {"sr_psnr": round(p_sr, 3), "bicubic_psnr": round(p_bi, 3),
            "gain_db": round(p_sr - p_bi, 3), "train_seconds": round(train_s, 1)}


def bench_inpaint(steps: int, size: int = 96, batch: int = 8, seed: int = 0,
                  eval_seeds: int = 3):
    """Seed-AVERAGED in-hole PSNR gain over the diffusion prefill, plus
    SSIM (structure evidence the reference only ever eyeballed). The gate
    the VERDICT set is >= 1 dB with seed error bars — a thin single-seed
    margin proves plumbing, not capability."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcmi_tpu.models.losses import random_hole_masks
    from pcmi_tpu.models.metrics import psnr, ssim
    from pcmi_tpu.models.training import InpaintGANTrainer, InpaintTrainConfig
    from pcmi_tpu.models.unet import InpaintUNet
    from pcmi_tpu.pipelines.generative import diffusion_prefill

    # capacity + cosine decay + flip-ensemble eval: the 1.5 dB-mean bar
    # needs all three (constant-lr default widths saturate ~1.04 dB)
    trainer = InpaintGANTrainer(
        InpaintTrainConfig(total_steps=steps),
        generator=InpaintUNet(widths=(48, 96, 192, 384)))
    key = jax.random.PRNGKey(seed)
    pool = make_pool(key, 48, size)
    state = trainer.init(jax.random.PRNGKey(seed + 1), pool[:batch])
    t0 = time.perf_counter()
    for i in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        imgs = sample_batch(k1, pool, batch)
        state, m = trainer.train_step(state, imgs, k2)
    train_s = time.perf_counter() - t0

    gains, psnrs, prefills, ssims = [], [], [], []
    for es in range(eval_seeds):
        ek = jax.random.PRNGKey(60_000 + seed + 97 * es)
        imgs_t = _batch(ek, batch, size)
        mask = random_hole_masks(jax.random.PRNGKey(61_000 + seed + 97 * es),
                                 (batch, size, size), 6, 10)
        out = trainer.infer(state, imgs_t, mask, ensemble=True)
        pre = jnp.stack([
            diffusion_prefill(imgs_t[i], mask[i, ..., 0] > 0.5)
            for i in range(batch)
        ])
        m3 = mask  # (B, H, W, 1) broadcasts over channels
        p_model = float(psnr(out, imgs_t, mask=m3))
        p_prefill = float(psnr(pre, imgs_t, mask=m3))
        # composite the hole fill into the image for structure metrics
        comp = jnp.where(m3 > 0.5, out, imgs_t)
        comp_pre = jnp.where(m3 > 0.5, pre, imgs_t)
        ssims.append((float(ssim(comp, imgs_t)), float(ssim(comp_pre, imgs_t))))
        gains.append(p_model - p_prefill)
        psnrs.append(p_model)
        prefills.append(p_prefill)
    gains = np.asarray(gains)
    return {"inpaint_psnr": round(float(np.mean(psnrs)), 3),
            "prefill_psnr": round(float(np.mean(prefills)), 3),
            "gain_db": round(float(gains.mean()), 3),
            "gain_db_std": round(float(gains.std()), 3),
            "gain_db_min": round(float(gains.min()), 3),
            "ssim": round(float(np.mean([a for a, _ in ssims])), 4),
            "ssim_prefill": round(float(np.mean([b for _, b in ssims])), 4),
            "eval_seeds": eval_seeds,
            "train_seconds": round(train_s, 1)}


def make_styled_scene(key, style: str, size: int = 64):
    """Two visually-distinct scene styles for prompt-steering evaluation:
    ``fields`` (dark Voronoi parcels, thin roads, no buildings) and
    ``urban`` (bright dense blocks with shadows)."""
    import jax
    import jax.numpy as jnp

    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    k = 10
    seeds = rng.uniform(0, size, (k, 2)).astype(np.float32)
    d2 = (ys[..., None] - seeds[:, 0]) ** 2 + (xs[..., None] - seeds[:, 1]) ** 2
    lab = np.argmin(d2, axis=-1)
    if style == "fields":
        refl = rng.uniform(0.15, 0.45, k).astype(np.float32)
        g = refl[lab]
        for _ in range(rng.integers(1, 3)):
            p = rng.uniform(0, size, 2)
            th = rng.uniform(0, np.pi)
            n_ = np.array([np.sin(th), -np.cos(th)])
            dist = np.abs((ys - p[0]) * n_[0] + (xs - p[1]) * n_[1])
            g = np.where(dist < 1.2, 0.1, g)
    elif style == "urban":
        refl = rng.uniform(0.35, 0.55, k).astype(np.float32)
        g = refl[lab]
        for _ in range(rng.integers(10, 16)):
            cy, cx = rng.uniform(4, size - 4, 2)
            hh, ww = rng.uniform(2, 6, 2)
            b = (np.abs(ys - cy) < hh) & (np.abs(xs - cx) < ww)
            s = (np.abs(ys - cy - hh) < 1.5) & (np.abs(xs - cx - ww / 2) < ww)
            g = np.where(s, 0.08, g)
            g = np.where(b, 0.9, g)
    else:
        raise ValueError(style)
    g = g + rng.normal(0, 0.02, g.shape).astype(np.float32)
    rgb = np.stack([0.92 * g + 0.04, g, 0.85 * g + 0.06], axis=-1)
    return jnp.asarray(np.clip(rgb, 0.0, 1.0), jnp.float32)


STYLE_CAPTIONS = {
    "fields": ("dark farm fields", "flat rural fields", "quiet dark farmland",
               "rural parcels with road", "dark flat fields"),
    "urban": ("bright urban blocks", "dense city buildings",
              "bright dense urban", "urban buildings with shadows",
              "dense bright blocks"),
}


def bench_diffusion(steps: int, size: int = 64, batch: int = 16,
                    seed: int = 0):
    """Conditioned-diffusion capability: free-text steering + CFG.

    Trains the tiled diffusion engine (TextEncoder conditioning,
    classifier-free-guidance dropout) from scratch on two caption-labelled
    scene styles, then measures on held-out masked scenes (VERDICT r3
    item 5 — "a measured steering metric"):

    * ``steer_brightness`` — in-hole mean-brightness shift urban-prompt
      minus fields-prompt (same seeds/holes; styles differ by reflectance
      and structure, so the conditional fill must move it);
    * ``divergence_g{1,3}`` — in-hole L1 divergence between the two
      prompts' fills at guidance 1 and 3: CFG must AMPLIFY steering;
    * ``matched_minus_mismatched_db`` — in-hole PSNR advantage of the
      style-matched prompt over the mismatched one (semantic fill
      quality, not just divergence).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pcmi_tpu.models.diffusion import (CondUNet, DiffusionConfig,
                                           TiledDiffusionEngine,
                                           tokenize_prompt)
    from pcmi_tpu.models.metrics import psnr

    cfg = DiffusionConfig(steps=18, tile=32, stride=24, img_channels=3,
                          train_timesteps=400, text_conditioning=True,
                          cfg_dropout=0.1)
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(16, 32, 64),
                                                   out_channels=3,
                                                   text_conditioning=True))
    key = jax.random.PRNGKey(seed)
    kf, ku = jax.random.split(key)
    pools = {
        "fields": jnp.stack([make_styled_scene(k, "fields", size)
                             for k in jax.random.split(kf, 24)]),
        "urban": jnp.stack([make_styled_scene(k, "urban", size)
                            for k in jax.random.split(ku, 24)]),
    }
    toks = {s: jnp.stack([jnp.asarray(tokenize_prompt(c), jnp.int32)
                          for c in cs]) for s, cs in STYLE_CAPTIONS.items()}

    params = eng.init_params(jax.random.PRNGKey(seed + 1))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    from pcmi_tpu.models.losses import random_hole_masks

    pool_all = jnp.concatenate([pools["fields"], pools["urban"]])
    tok_all = jnp.stack([toks["fields"], toks["urban"]])  # (2, 5, L)
    n_pool = pools["fields"].shape[0]

    @jax.jit
    def step(params, opt_state, key):
        ki, kc, kv, km, kl = jax.random.split(key, 5)
        style = jax.random.randint(kc, (batch,), 0, 2)
        idx = jax.random.randint(ki, (batch,), 0, n_pool) + style * n_pool
        imgs = pool_all[idx] * 2.0 - 1.0
        variant = jax.random.randint(kv, (batch,), 0, tok_all.shape[1])
        tk = tok_all[style, variant]
        masks = random_hole_masks(km, (batch, size, size), 8, 16)
        loss, grads = jax.value_and_grad(eng.train_step_loss)(
            params, imgs, masks, kl, None, tk)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.perf_counter()
    loss0 = last = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i == 20:
            loss0 = float(loss)
    last = float(loss)
    train_s = time.perf_counter() - t0

    # held-out eval: centre hole, fill under each prompt
    import numpy as _np

    hole = _np.zeros((size, size, 1), _np.float32)
    q = size // 4
    hole[q:size - q, q:size - q] = 1.0
    hole = jnp.asarray(hole)
    prompts = {"fields": "dark farm fields", "urban": "bright urban blocks"}

    def fill(img, prompt, s, g):
        out = eng.inpaint(params, img * 2.0 - 1.0, hole, seed=s,
                          prompt=prompt, guidance=g)
        return (out + 1.0) * 0.5

    hv = hole > 0.5
    div = {1.0: [], 3.0: []}
    steer = []
    matched_adv = []
    for s_i, style in enumerate(("fields", "urban")):
        img = make_styled_scene(jax.random.PRNGKey(90_000 + seed + s_i),
                                style, size)
        other = "urban" if style == "fields" else "fields"
        for g in (1.0, 3.0):
            fa = fill(img, prompts[style], 7 + s_i, g)
            fb = fill(img, prompts[other], 7 + s_i, g)
            div[g].append(float(jnp.mean(jnp.abs(fa - fb)[hv[..., 0]])))
            if g == 3.0:
                pm = float(psnr(fa[None], img[None], mask=hole[None]))
                px = float(psnr(fb[None], img[None], mask=hole[None]))
                matched_adv.append(pm - px)
                sign = 1.0 if style == "urban" else -1.0
                steer.append(sign * float(
                    jnp.mean(fa[hv[..., 0]]) - jnp.mean(fb[hv[..., 0]])))
    out = {
        "train_seconds": round(train_s, 1),
        "loss_start": round(loss0, 4) if loss0 else None,
        "loss_end": round(last, 4),
        "divergence_g1": round(float(np.mean(div[1.0])), 4),
        "divergence_g3": round(float(np.mean(div[3.0])), 4),
        "steer_brightness": round(float(np.mean(steer)), 4),
        "matched_minus_mismatched_db": round(float(np.mean(matched_adv)), 3),
    }
    return out


def bench_dip(size: int = 96, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from pcmi_tpu.models.dip import DIPConfig, DIPEngine
    from pcmi_tpu.models.metrics import psnr

    clean = make_scene_rgb(jax.random.PRNGKey(70_000 + seed), size)
    noisy = jnp.clip(
        clean + 0.1 * jax.random.normal(jax.random.PRNGKey(70_001), clean.shape),
        0.0, 1.0)
    # enhance = fit DIP to the whole image; the prior's spectral bias does
    # the denoising (moderate iteration budget = classic DIP early stopping)
    engine = DIPEngine(DIPConfig(iters=300))
    res = engine.enhance(noisy)
    p_out = float(psnr(jnp.asarray(res.output), clean))
    p_in = float(psnr(noisy, clean))
    return {"dip_psnr": round(p_out, 3), "noisy_psnr": round(p_in, 3),
            "gain_db": round(p_out - p_in, 3)}


def main(sr_steps=2500, inpaint_steps=30000, diffusion_steps=4000):
    sr = bench_sr(sr_steps)
    inp = bench_inpaint(inpaint_steps)
    dip = bench_dip()
    diff = bench_diffusion(diffusion_steps)
    result = {
        "metric": "generative_quality",
        "value": sr["gain_db"],
        "unit": "dB PSNR over bicubic (SR)",
        "vs_baseline": round(sr["sr_psnr"] / max(sr["bicubic_psnr"], 1e-9), 3),
        "detail": {
            "sr": sr, "inpaint": inp, "dip": dip, "diffusion": diff,
            # VERDICT r3 item 5 bars: inpaint mean >= 1.5 dB with EVERY
            # seed >= 1.0 dB; plus measured prompt steering with CFG
            "gates": {
                "sr_beats_bicubic": bool(sr["gain_db"] > 0),
                "inpaint_beats_prefill": bool(inp["gain_db"] > 0),
                "inpaint_gain_ge_1.5db_mean": bool(inp["gain_db"] >= 1.5),
                "inpaint_all_seeds_ge_1db": bool(inp["gain_db_min"] >= 1.0),
                "dip_denoises": bool(dip["gain_db"] > 0),
                "diffusion_steers": bool(diff["steer_brightness"] > 0.02),
                "diffusion_cfg_amplifies": bool(
                    diff["divergence_g3"] > diff["divergence_g1"]),
                "diffusion_matched_prompt_better": bool(
                    diff["matched_minus_mismatched_db"] > 0),
            },
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr-steps", type=int, default=2500)
    ap.add_argument("--inpaint-steps", type=int, default=30000)
    ap.add_argument("--diffusion-steps", type=int, default=4000)
    a = ap.parse_args()
    main(a.sr_steps, a.inpaint_steps, a.diffusion_steps)
