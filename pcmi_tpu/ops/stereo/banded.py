"""Tile-adaptive disparity range: coarse pass -> per-tile window offsets
-> narrow full-resolution search around a smooth integer warp.

The reference hardcodes MAX_DISP=288 and pays the full signed search for
every pixel (``members/rafael/disparity/constants.py:54-57``).
:func:`pcmi_tpu.pipelines.height_map.required_max_disp` already shrinks
that to what the AOI geometry needs; this module shrinks it further to
what each TILE of the scene needs:

1. **Coarse pass** — the full matcher at ``1/adapt_coarse_scale``
   resolution (~3% of the fine-pass work at the default scale 4) gives a
   robust low-resolution disparity field.
2. **Tile offsets** — for every ``adapt_band_rows x adapt_band_cols``
   tile, the window offset that maximises the covered coarse-disparity
   mass, read directly off the tile's count-CDF (:func:`band_centers`).
   Tiles must be 2D on real terrain: disparity varies along x (terrain
   across the AOI) as much as along y — measured row-band spreads on the
   D=288 bench scene are ~100 px median / 220 px q90, versus ~25 px
   median for 64 px tiles. Offsets are bilinearly interpolated to a
   per-pixel integer field ``o(y, x)`` (smooth ramps, no artificial steps
   for SGM's P2 to misread) and clamped so every window stays inside the
   geometric envelope.
3. **Warp + narrow search** — the UNCHANGED production matcher
   (census+AD, Pallas SGM, fused WTA, derived right view, L/R check,
   refinement, photoconsistency) runs against the ``o``-warped right view
   with ``max_disp = adapt_local_disp`` — typically 2x narrower than the
   envelope on steep scenes. Census planes are computed on the UNWARPED
   right and warped afterwards, so per-pixel costs are bit-exactly the
   full-search costs at the composed disparity (a naive pre-warp would
   shear every census descriptor near offset ramps). Global disparity is
   recomposed as ``dl + o(y, x - dl)`` (the offset at the matched right
   position, linearly interpolated).

Everything is traced data under one jit: offsets are data-dependent
VALUES but every shape is static, so the whole banded pipeline still
compiles once per config.

Why tile windows and not per-pixel coarse-to-fine: a per-pixel warp
(``hierarchical.py``) propagates coarse ERRORS into confident wrong fine
matches at discontinuities; a tile's coverage-optimal offset is immune to
any minority of coarse blunders, and the window is sized to the tile's
true relief spread, so the fine pass stays a genuine search.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pcmi_tpu.config import StereoConfig, _round_up
from pcmi_tpu.ops.stereo.matching import (
    DisparityResult,
    compute_disparity,
    refine_disparity,
    shift_rows,
)


def pool_masked(img: jnp.ndarray, mask: jnp.ndarray, scale: int):
    """Masked ``scale x scale`` mean pool. Returns (pooled, pooled_valid).

    A coarse cell is valid when at least half its fine pixels are.
    """
    h, w = img.shape
    ph = (-h) % scale
    pw = (-w) % scale
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)))
        mask = jnp.pad(mask, ((0, ph), (0, pw)))
    hc = img.shape[0] // scale
    wc = img.shape[1] // scale
    m = mask.astype(jnp.float32).reshape(hc, scale, wc, scale)
    x = (img * mask).reshape(hc, scale, wc, scale)
    cnt = m.sum(axis=(1, 3))
    val = x.sum(axis=(1, 3)) / jnp.maximum(cnt, 1.0)
    return val, cnt >= (scale * scale) / 2.0


def coarse_config(cfg: StereoConfig) -> StereoConfig:
    """Matcher config for the 1/scale coarse pass.

    The coarse field only feeds tile-offset statistics, so the cheapest
    trustworthy settings apply: small census/block (the downsample already
    aggregates), derived right view, no cross-checker, stride 1.
    """
    scale = cfg.adapt_coarse_scale
    md = _round_up(-(-cfg.max_disp // scale), 16)
    return dataclasses.replace(
        cfg,
        max_disp=md,
        block_size=5,
        census_window=5,
        disp_stride=1,
        band_recover=False,
        right_sgm="derived",
        adapt_band_rows=0,
    )


def band_centers(
    disp_px: jnp.ndarray,
    valid: jnp.ndarray,
    n_tiles_y: int,
    d_min: float,
    d_max: float,
    half: float,
    n_tiles_x: int = 1,
    margin: float = 8.0,
    bins: int = 128,
    min_count: int = 24,
):
    """((ty, tx) centers, (ty, tx) counts): coverage-optimal window offsets.

    ``disp_px``/``valid`` live on any (coarse) grid; remainder rows/cols
    beyond an integral tiling are ignored. For each tile the offset
    maximises the mass of coarse disparities inside the effective window
    ``±(half - margin)``, evaluated directly on the tile's count-CDF (one
    fused compare-and-count pass, no sorts): ``cov(o) = F(o+r) - F(o-r)``,
    argmax over the threshold grid, plateau-centred. This is robust to
    blunder tails (they carry negligible mass — quantile-interval
    midpoints proved fragile: q01/q99 got dragged ~40 px by 1-2% of
    LR-surviving coarse blunders) AND coverage-optimal (a roof occupying
    5% of the tile still pulls the window when it fits). ``margin``
    absorbs coarse-pass quantisation/matching error. Tiles with fewer
    than ``min_count`` valid cells take the whole-frame offset.
    """
    hc, wc = disp_px.shape
    rows = hc // n_tiles_y
    cols = wc // n_tiles_x
    ty, tx = n_tiles_y, n_tiles_x

    def tiles(a):
        a = a[: rows * ty, : cols * tx]
        return a.reshape(ty, rows, tx, cols).transpose(0, 2, 1, 3) \
                .reshape(ty * tx, rows * cols)

    xb = tiles(disp_px)
    mb = tiles(valid)
    j = jnp.arange(bins, dtype=jnp.float32)
    ts = d_min + (d_max - d_min) * j / (bins - 1)
    counts = jnp.sum(
        (xb[:, :, None] <= ts[None, None, :]) & mb[:, :, None],
        axis=1, dtype=jnp.float32,
    )  # (ty*tx, bins) cumulative over the threshold grid

    def plateau_center(cum):
        bin_w = (d_max - d_min) / (bins - 1)
        s = max(int((half - margin) / max(bin_w, 1e-6)), 1)
        cp = jnp.pad(cum, ((0, 0), (s, s)), mode="edge")
        cov = cp[:, 2 * s:] - cp[:, :-2 * s]      # mass within ±(half-m)
        best = cov.max(axis=-1, keepdims=True)
        isb = (cov >= best - 1e-6).astype(jnp.float32)
        idx = jnp.arange(bins, dtype=jnp.float32)
        jstar = (isb * idx).sum(-1) / jnp.maximum(isb.sum(-1), 1.0)
        return d_min + bin_w * jstar

    centers = plateau_center(counts)
    n_tile = counts[:, -1]
    g_center = plateau_center(counts.sum(axis=0, keepdims=True))[0]
    centers = jnp.where(n_tile >= min_count, centers, g_center)
    return centers.reshape(ty, tx), n_tile.reshape(ty, tx)


def field_offsets(
    centers: jnp.ndarray,
    tile_rows: int,
    tile_cols: int,
    height: int,
    width: int,
    o_min: float,
    o_max: float,
    x_coords: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear interpolation of the (ty, tx) tile centers to an int32
    offset field (separable jnp.interp; edge tiles extend flat).

    ``x_coords`` overrides the column sample positions — the chunked warp
    evaluates the field at chunk centres instead of every pixel, giving a
    (H, n_chunks) grid.
    """
    ty, tx = centers.shape
    yc = (jnp.arange(ty, dtype=jnp.float32) + 0.5) * tile_rows
    xc = (jnp.arange(tx, dtype=jnp.float32) + 0.5) * tile_cols
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = (jnp.arange(width, dtype=jnp.float32)
          if x_coords is None else x_coords.astype(jnp.float32))
    coly = jax.vmap(lambda c: jnp.interp(ys, yc, c),
                    in_axes=1, out_axes=1)(centers)        # (H, tx)
    full = jax.vmap(lambda r: jnp.interp(xs, xc, r))(coly)  # (H, len(xs))
    full = jnp.clip(full, o_min, o_max)
    return jnp.round(full).astype(jnp.int32)


def compose_global(disp_local: jnp.ndarray, o_chunks: jnp.ndarray,
                   chunk: int, d_min: int, d_max: int, stride: int = 1):
    """Global disparity ``dl + o(y, x - dl)``: the offset evaluated at the
    matched RIGHT position.

    Gather-free: the fractional lookup is a triangle-weighted scan over
    the static local-disparity grid (the photoconsistency trick — each
    step one contiguous slice of the edge-padded offset plane), linearly
    interpolating o between grid shifts. Exact where o is locally linear;
    at chunk steps the interpolation blends the two sides, which only
    affects matches landing within a pixel of a chunk boundary.
    """
    h, w = disp_local.shape
    if o_chunks.shape[1] == 1:
        # row-constant offsets: the composition is exact without lookup
        return disp_local + o_chunks.astype(jnp.float32)
    o_plane = (jnp.repeat(o_chunks, chunk, axis=1)[:, :w]
               if chunk > 1 else o_chunks).astype(jnp.float32)
    pad = max(abs(d_min), abs(d_max)) + stride
    op = jnp.pad(o_plane, ((0, 0), (pad, pad)), mode="edge")
    from pcmi_tpu.ops.stereo.matching import _scan_unroll

    def step(acc, s):
        shifted = jax.lax.dynamic_slice_in_dim(op, pad - s, w, axis=1)
        wgt = jnp.maximum(1.0 - jnp.abs(disp_local - s) / stride, 0.0)
        return acc + wgt * shifted, None

    ds = jnp.arange(d_min, d_max + stride, stride, dtype=jnp.int32)
    o_at, _ = jax.lax.scan(step, jnp.zeros_like(disp_local), ds,
                           unroll=_scan_unroll())
    return disp_local + o_at


def _warp_chunk(cfg: StereoConfig, width: int) -> int:
    """Effective warp-chunk width: row mode warps whole rows at once;
    otherwise the largest power-of-two divisor of the canvas width that
    is ≤ ``adapt_warp_chunk`` (production canvases are padded to 128, so
    this is normally just ``adapt_warp_chunk``)."""
    if cfg.adapt_band_cols == 0:
        return width
    ck = cfg.adapt_warp_chunk
    while ck > 1 and width % ck:
        ck //= 2
    return max(ck, 1)


def _offsets_from_coarse(left, right, valid_l, valid_r, cfg,
                         noise_ratio=None):
    """((H, W/chunk) int32 offsets, coarse result) for the configured
    tiling. Offsets are sampled at warp-chunk centres (see shift_rows)."""
    h, w = left.shape
    scale = cfg.adapt_coarse_scale
    rows = cfg.adapt_band_rows
    cols = cfg.adapt_band_cols or w
    ty = max(h // rows, 1)
    tx = max(w // cols, 1)
    d_min_g = cfg.min_disparity
    d_max_g = cfg.min_disparity + cfg.max_disp - 1
    half = cfg.adapt_local_disp // 2
    o_lo = float(d_min_g + half)
    o_hi = float(d_max_g - (half - 1))
    if o_lo > o_hi:  # window >= envelope: degenerate to the global search
        o_lo = o_hi = float(d_min_g + cfg.max_disp // 2)

    lc, vlc = pool_masked(left, valid_l, scale)
    rc, vrc = pool_masked(right, valid_r, scale)
    ccfg = coarse_config(cfg)
    cres = compute_disparity(lc, rc, vlc, vrc, ccfg, aggregation="sgm",
                             noise_ratio=noise_ratio)
    centers, _ = band_centers(
        cres.disparity * scale, cres.valid, ty,
        float(d_min_g), float(d_max_g), half=float(half), n_tiles_x=tx,
    )
    ck = _warp_chunk(cfg, w)
    xs = (jnp.arange(w // ck, dtype=jnp.float32) + 0.5) * ck
    o_chunks = field_offsets(centers, rows, cols, h, w // ck, o_lo, o_hi,
                             x_coords=xs)
    return o_chunks, cres


def banded_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    valid_l: jnp.ndarray,
    valid_r: jnp.ndarray,
    cfg: StereoConfig,
    noise_ratio: jnp.ndarray | None = None,
    offsets: jnp.ndarray | None = None,
):
    """Full tile-adaptive matcher. Returns ``(res0, res, photo, o_field)``.

    ``res0``/``res`` mirror :func:`compute_disparity` /
    :func:`refine_disparity` outputs with ``disparity`` and
    ``check_disparity`` already recomposed to GLOBAL coordinates
    (``margin``, ``valid``, ``cost`` are warp-invariant).
    ``photo`` is the photoconsistency residual of the refined field
    (computed in the warped frame — identical values to the global-frame
    map, at ``adapt_local_disp`` passes instead of ``max_disp``).
    ``disparity_right`` stays in the warped right frame; its only
    consumer (refinement's L/R recheck) has already run.

    ``offsets`` is an expert/testing hook: a caller-supplied (H,) or
    (H, W) offset field used instead of the coarse pass (clamped so the
    window stays inside the envelope, resampled to the warp-chunk grid).
    """
    from pcmi_tpu.pipelines.height_map import photoconsistency

    h, w = left.shape
    d_min_g = cfg.min_disparity
    d_max_g = cfg.min_disparity + cfg.max_disp - 1
    half = cfg.adapt_local_disp // 2
    o_lo = float(d_min_g + half)
    o_hi = float(d_max_g - (half - 1))
    if o_lo > o_hi:
        o_lo = o_hi = float(d_min_g + cfg.max_disp // 2)
    chunk = _warp_chunk(cfg, w)
    nc = w // chunk

    if offsets is not None:
        o = jnp.round(jnp.clip(offsets.astype(jnp.float32), o_lo, o_hi))
        if o.ndim == 1:
            o_chunks = jnp.tile(o.astype(jnp.int32)[:, None], (1, nc))
        else:
            o_chunks = o.astype(jnp.int32)[:, chunk // 2::chunk][:, :nc]
    else:
        o_chunks, _ = _offsets_from_coarse(left, right, valid_l, valid_r,
                                           cfg, noise_ratio)

    # narrow production matcher, composed with the offset INSIDE the cost
    # build (census planes computed on the unwarped right, then warped)
    pad = cfg.max_disp // 2 + 1
    lcfg = dataclasses.replace(cfg, max_disp=cfg.adapt_local_disp,
                               adapt_band_rows=0)
    res0 = compute_disparity(left, right, valid_l, valid_r, lcfg,
                             aggregation="sgm", noise_ratio=noise_ratio,
                             row_shift=o_chunks, row_shift_pad=pad,
                             row_shift_chunk=chunk)
    res = refine_disparity(res0, left, lcfg)
    # photoconsistency is per-pixel in the right INTENSITY — the plain
    # warp is exact for it (no neighbourhood descriptors involved)
    right_w = shift_rows(right, o_chunks, pad, fill=0.0, chunk=chunk)
    photo = photoconsistency(
        left, right_w, res.disparity,
        d_min=lcfg.min_disparity,
        d_max=lcfg.min_disparity + lcfg.max_disp - 1,
        stride=lcfg.disp_stride,
    )

    d_lo = lcfg.min_disparity
    d_hi = lcfg.min_disparity + lcfg.max_disp - 1

    def to_global(r: DisparityResult) -> DisparityResult:
        return r._replace(
            disparity=compose_global(r.disparity, o_chunks, chunk,
                                     d_lo, d_hi, stride=lcfg.disp_stride),
            check_disparity=(None if r.check_disparity is None
                             else compose_global(r.check_disparity, o_chunks,
                                                 chunk, d_lo, d_hi,
                                                 stride=lcfg.disp_stride)),
        )

    return to_global(res0), to_global(res), photo, o_chunks


def window_coverage(
    left, right, valid_l, valid_r, cfg: StereoConfig,
) -> jnp.ndarray:
    """Diagnostic: fraction of coarse-valid pixels whose coarse disparity
    falls inside their tile's local window (with 4-px slack for coarse
    error). Near 1.0 means ``adapt_local_disp`` covers the scene's
    per-tile relief; well below means the window is clipping real
    structure and completeness will pay.
    """
    o_chunks, cres = _offsets_from_coarse(left, right, valid_l, valid_r, cfg)
    scale = cfg.adapt_coarse_scale
    half = cfg.adapt_local_disp // 2
    disp_c = cres.disparity * scale
    hc, wc = disp_c.shape
    # offset field sampled at coarse-cell centres
    chunk = _warp_chunk(cfg, left.shape[1])
    o_field = jnp.repeat(o_chunks, chunk, axis=1)
    oc = o_field[scale // 2::scale, scale // 2::scale][:hc, :wc]
    inside = jnp.abs(disp_c - oc.astype(jnp.float32)) <= (half - 4)
    n = jnp.maximum(jnp.sum(cres.valid), 1)
    return jnp.sum(inside & cres.valid) / n
