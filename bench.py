"""Benchmark: stereo→height throughput on the flagship pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s/chip", "vs_baseline": N}

``value``        — warm throughput of the jitted per-pair core
                   (rectified pair -> disparity -> height) on the default
                   JAX device (the TPU chip under the driver).
``vs_baseline``  — speedup over the CPU NumPy reference implementation
                   (pcmi_tpu.ops.stereo.numpy_ref), the BASELINE.json
                   config-1 parity path. The reference repo publishes no
                   numbers (BASELINE.md), so this CPU path is the
                   denominator the ≥20x north-star target refers to —
                   PINNED to a documented quiet-rig measurement
                   (PINNED_CPU_MPIX_S below; the per-run measurement is
                   reported alongside for drift visibility).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _fail_line(msg: str) -> None:
    """Emit the one-line machine-readable failure record and exit 0.

    Round-3 lesson (VERDICT item 1b): when the TPU tunnel is wedged the
    driver captured a bare traceback / rc=1 and the round scored as if the
    work didn't happen. On any failure the driver must still get ONE
    parseable JSON line.
    """
    print(json.dumps({
        "metric": "stereo_to_height_throughput",
        "value": None,
        "unit": "Mpix/s/chip",
        "vs_baseline": None,
        "error": msg[:500],
    }))
    sys.exit(0)


def _probe_backend(timeout_s: float = None, retries: int = None) -> str:
    """Bounded-time JAX backend init in a subprocess, with retries.

    ``jax.devices()`` can hang indefinitely when the axon TPU transport is
    wedged (observed twice in round 3), so never call it first in THIS
    process: probe in a child bounded by ``timeout_s``. Returns the device
    string on success; raises RuntimeError after all retries fail.
    """
    import os
    import subprocess

    if timeout_s is None:
        timeout_s = float(os.environ.get("PCMI_BENCH_PROBE_TIMEOUT", 120.0))
    if retries is None:
        retries = int(os.environ.get("PCMI_BENCH_PROBE_RETRIES", 2))
    code = "import jax; print('DEV:' + str(jax.devices()[0]))"
    last = ""
    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
                env=dict(os.environ),
            )
            if proc.returncode == 0 and "DEV:" in proc.stdout:
                return proc.stdout.split("DEV:", 1)[1].strip()
            last = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
            last = last[0] if last else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            last = f"backend init timed out after {timeout_s:.0f}s"
        if attempt < retries:
            time.sleep(10.0)
    raise RuntimeError(f"JAX backend unavailable after {retries + 1} "
                       f"attempts: {last}")


# --- Pinned CPU-reference denominator (VERDICT r3 item 4) ---
# The ≥20x north-star ratio needs a FIXED denominator, not one re-measured
# on a possibly-loaded shared rig every round (it drifted 0.145 → 0.021
# Mpix/s across rounds 1-3 while the CPU code path changed only once).
# Method, reproducible with `python bench.py --cpu-pin`:
#   * workload: pcmi_tpu.ops.stereo.numpy_ref.stereo_pipeline_np (the
#     BASELINE.json config-1 CPU parity path) on the FIXED 192x192 crop
#     [0:192, 0:192] of the bench scene's rectified pair (synthetic scene
#     seed=1, 512x512 canvas — fully deterministic), max_disp=80, block 9,
#     SGM aggregation — the same per-Mpix work as the TPU path.
#   * timing: median of 9 single-threaded reps after 1 warm-up, taken as
#     the best median of two such batches — robust to transient rig load.
#   * pinned on 2026-08-18 on this rig: two independent quiet runs
#     (load < 1 on the single core) measured batch medians
#     0.0473/0.0462 and 0.0515/0.0513 Mpix/s — reproducible within ±9%,
#     pinned to the mean 0.0491. Earlier rounds' lower numbers
#     (0.021-0.059) were best-of-3 measured while other jobs shared the
#     core; the pin supersedes them (and HALVES the historical
#     vs_baseline ratios — the honest denominator).
# ``vs_baseline`` divides by THIS constant; the freshly measured value is
# reported alongside in ``detail.cpu_ref_mpix_s_measured`` so drift stays
# visible without moving the scoreboard.
PINNED_CPU_MPIX_S = 0.0491


def _measure_cpu_ref(l_np, r_np, v_np, max_disp, block_size, lr_threshold,
                     reps: int = 9):
    """Median-of-reps CPU reference throughput (Mpix/s) on a fixed crop."""
    from pcmi_tpu.ops.stereo import numpy_ref as nref

    ch, cw = l_np.shape
    times = []
    for i in range(reps + 1):
        t0 = time.perf_counter()
        nref.stereo_pipeline_np(l_np, r_np, v_np, v_np, max_disp,
                                block_size, lr_threshold, aggregation="sgm")
        times.append(time.perf_counter() - t0)
    times = sorted(times[1:])  # drop the warm-up rep
    dt = times[len(times) // 2]
    return ch * cw / dt / 1e6


def _cpu_pin_workload():
    """The frozen CPU-pin inputs: crop + config (see PINNED_CPU_MPIX_S)."""
    import jax.numpy as jnp

    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
    from pcmi_tpu.pipelines.height_map import HeightMapPipeline, _rectify_pair

    scene = make_stereo_scene(
        seed=1, out_shape=(512, 512), ground_shape=(640, 640),
        h_range=(0.0, 40.0), views=((10.0, 80.0), (20.0, 250.0)),
    )
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8),
        rectify=RectifyConfig(height_range=(0.0, 40.0)),
    )
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(
        scene.rpcs[0], scene.rpcs[1], *aoi_lonlat_ranges(scene),
        scene.images[0].shape, scene.images[1].shape,
    )
    stereo_cfg = pipe.stereo_cfg_for([geom])
    r1, r2 = _rectify_pair(
        scene.images[0], scene.images[1],
        jnp.asarray(geom.H1, jnp.float32), jnp.asarray(geom.H2, jnp.float32),
        geom.out_shape,
    )
    ch, cw = 192, 192
    l_np = np.asarray(r1)[:ch, :cw]
    r_np = np.asarray(r2)[:ch, :cw]
    v_np = np.ones((ch, cw), bool)
    return l_np, r_np, v_np, stereo_cfg


def cpu_pin():
    """Re-measure the pinned CPU denominator (two median-of-9 batches)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    l_np, r_np, v_np, scfg = _cpu_pin_workload()
    vals = [
        _measure_cpu_ref(l_np, r_np, v_np, scfg.max_disp, scfg.block_size,
                         scfg.lr_threshold)
        for _ in range(2)
    ]
    print(json.dumps({
        "cpu_pin_mpix_s_batches": [round(v, 4) for v in vals],
        "cpu_pin_mpix_s": round(max(vals), 4),
        "pinned_constant": PINNED_CPU_MPIX_S,
        "max_disp": scfg.max_disp,
    }))


def main():
    if "--cpu-pin" in sys.argv:
        cpu_pin()
        return
    try:
        device_str = _probe_backend()
    except RuntimeError as e:
        _fail_line(str(e))
    try:
        _run_bench(device_str)
    except Exception as e:  # noqa: BLE001 — one parseable line, always
        _fail_line(f"{type(e).__name__}: {e}")


def _run_bench(device_str: str):
    import os

    import jax

    # persistent compilation cache: the bench compiles ~15 distinct
    # executables (~20 of its ~34 wall minutes on a cold run); cached
    # re-runs (e.g. the driver's capture after a self-run) are
    # execution-dominated
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
    from pcmi_tpu.pipelines.height_map import HeightMapPipeline, pair_core
    from pcmi_tpu.geometry.rectify import triangulation_operator

    # --- TPU path: full pair core on a WV3-crop-sized canvas ---
    scene = make_stereo_scene(
        seed=1, out_shape=(512, 512), ground_shape=(640, 640),
        h_range=(0.0, 40.0),
        views=((10.0, 80.0), (20.0, 250.0)),
    )
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8),
        rectify=RectifyConfig(height_range=(0.0, 40.0)),
    )
    pipe = HeightMapPipeline(cfg)
    geom = pipe.build_geometry(
        scene.rpcs[0], scene.rpcs[1], *aoi_lonlat_ranges(scene),
        scene.images[0].shape, scene.images[1].shape,
    )
    stereo_cfg = pipe.stereo_cfg_for([geom])

    from pcmi_tpu.pipelines.height_map import _rectify_pair
    r1, r2 = _rectify_pair(
        scene.images[0], scene.images[1],
        jnp.asarray(geom.H1, jnp.float32), jnp.asarray(geom.H2, jnp.float32),
        geom.out_shape,
    )
    M, b = triangulation_operator(geom)

    # Synchronisation: on the tunnelled device transport block_until_ready
    # does NOT wait for execution and each dispatch pays a ~40 ms host
    # round-trip that would NOT exist on a directly-attached TPU. The
    # honest device-throughput measurement therefore runs K frames per
    # dispatch inside one jitted lax.scan (the production pattern: a
    # multi-date AOI streams pairs back to back through one executable),
    # fetches ONE scalar, subtracts the measured fetch round-trip, and
    # divides by K. The carry-dependent input perturbation (+carry*1e-20)
    # defeats CSE across scan iterations.
    dt, prod = _device_time_per_frame(pair_core, r1, r2, M, b, stereo_cfg,
                                      k=10)
    h, w = geom.out_shape
    mpix_tpu = h * w / dt / 1e6

    # --- CPU NumPy reference: the same frozen workload as the pinned
    # denominator (crop [0:192,0:192] of THIS scene's rectified pair, same
    # disparity width + SGM work). The ratio uses PINNED_CPU_MPIX_S; the
    # fresh measurement is reported for drift visibility only.
    ch, cw = 192, 192
    l_np = np.asarray(r1)[:ch, :cw]
    r_np = np.asarray(r2)[:ch, :cw]
    v_np = np.ones((ch, cw), bool)
    mpix_cpu_measured = _measure_cpu_ref(
        l_np, r_np, v_np, stereo_cfg.max_disp, stereo_cfg.block_size,
        stereo_cfg.lr_threshold, reps=5)
    mpix_cpu = PINNED_CPU_MPIX_S

    # accuracy vs exact synthetic truth (the BASELINE ≤1 m RMSE gate) —
    # computed from the timing executable's final product (no extra compile)
    p_height, p_xyz, p_valid = prod
    valid = np.asarray(p_valid)
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    gx = (np.asarray(p_xyz[..., 0]) - ox) / scene.ground_gsd
    gy = (np.asarray(p_xyz[..., 1]) - oy) / scene.ground_gsd
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) & (gy >= 0) & (gy < terr.shape[0] - 1)
    tt = terr[np.clip(gy.astype(int), 0, terr.shape[0] - 1),
              np.clip(gx.astype(int), 0, terr.shape[1] - 1)]
    m = valid & inb
    err = np.asarray(p_height)[m] - tt[m]
    rmse = float(np.sqrt(np.mean(err**2))) if m.any() else float("nan")

    # --- Per-stage roofline accounting on the flagship workload ---
    stages = _bench_stages(r1, r2, M, b, stereo_cfg)
    stages["core_ms"] = round(dt * 1e3, 2)

    # --- Reference disparity envelope: MAX_DISP=288 (ref constants.py:54-57)
    # A steep-convergence fine-GSD scene whose geometry genuinely needs the
    # full signed 288-px search (gain ≈ 5.3 px/m over 48 m of relief).
    d288 = _bench_d288()

    # --- Multi-day fusion throughput (BASELINE.json metric: points/sec) ---
    fusion = _bench_fusion()

    # --- Per-family accuracy sweep (VERDICT r2 item 2): every scene family
    # must hold the ≤1 m gate with the production fast paths on ---
    families = _bench_families()

    # Completeness: fraction of the OBSERVABLE canvas (pixels where both
    # rectified images carry data — the epipolar-rotated footprints cover
    # only ~30% of their padded bounding canvas) that yields a valid height.
    # The reference likewise produces height only over the non-margin
    # data region of the rectified frame (``disparity.py:182-204``).
    observable = (np.asarray(r1) >= 0) & (np.asarray(r2) >= 0)
    valid_fraction = float(valid.sum() / max(observable.sum(), 1))

    result = {
        "metric": "stereo_to_height_throughput",
        "value": round(mpix_tpu, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_tpu / mpix_cpu, 2),
        "detail": {
            "canvas": [h, w],
            "max_disp": stereo_cfg.max_disp,
            "cpu_ref_mpix_s": round(mpix_cpu, 4),
            "cpu_ref_mpix_s_measured": round(mpix_cpu_measured, 4),
            "cpu_ref_pinned": True,
            "height_rmse_m": round(rmse, 3),
            "valid_fraction": round(valid_fraction, 4),
            "canvas_valid_fraction": round(float(valid.mean()), 4),
            "observable_fraction": round(float(observable.mean()), 4),
            "gates": {
                "rmse_le_1m": bool(rmse <= 1.0),
                "valid_fraction_ge_0.5": bool(valid_fraction >= 0.5),
            },
            "stages": stages,
            "d288": d288,
            "fusion": fusion,
            "families": families,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _device_time_per_frame(core, r1, r2, M, b, stereo_cfg, k=10):
    """(seconds-per-frame, last product) for pair_core, K in-graph repeats.

    The final iteration's product rides along in the scan carry (no
    stacking), so the accuracy metrics reuse THIS compiled executable —
    the remote compile service on this rig is slow and heavily shared, so
    every avoided compilation matters more than any runtime trim.
    """
    import jax
    import jax.numpy as jnp

    h, w = r1.shape

    @jax.jit
    def rep(a, b_, M_, bb):
        init_prod = (jnp.zeros((h, w)), jnp.zeros((h, w, 3)),
                     jnp.zeros((h, w), bool))

        def body(carry, _):
            acc, _prev = carry
            out = core(a + acc * 1e-20, b_, M_, bb, stereo_cfg)
            return (acc + jnp.nansum(out.height),
                    (out.height, out.xyz, out.valid)), None

        (acc, prod), _ = jax.lax.scan(
            body, (jnp.float32(0.0), init_prod), None, length=k)
        return acc, prod

    float(rep(r1, r2, M, b)[0])  # compile + warm
    rtt_probe = jax.jit(lambda: jnp.float32(1.0))
    float(rtt_probe())
    t0 = time.perf_counter()
    float(rtt_probe())
    rtt = time.perf_counter() - t0
    best = float("inf")
    prod = None
    for _ in range(2):  # best-of-2: the shared tunnel shows rare slow reps
        t0 = time.perf_counter()
        acc, prod = rep(r1, r2, M, b)
        float(acc)
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
    return best / k, prod


# v5e (TPU v5 lite) per-chip ceilings for the roofline estimates below:
# HBM bandwidth 819 GB/s (datasheet); VPU f32 throughput estimated as
# (8, 128) vector lanes x 4 ALUs x ~0.94 GHz ≈ 3.85e12 op/s. The matcher
# is VPU/HBM work by design (no MXU-shaped matmuls in the hot loop), so
# the MXU's 197 bf16 TFLOP/s is not the relevant ceiling.
PEAK_HBM_B_S = 819e9
PEAK_VPU_OP_S = 3.85e12


def _bench_stages(r1, r2, M, b, cfg, k: int = 6):
    """Per-stage device times + roofline utilization for the pair core.

    VERDICT r3 item 7: makes "SGM is at its floor" falsifiable. Each stage
    is timed as its own jitted k-rep scan (same fetch-RTT discipline as
    the end-to-end number); ``bytes``/``ops`` are ESTIMATES from the
    explicit traffic models in the code below (volume passes dominate, so
    the models count volume-sized reads/writes and per-element arithmetic;
    fixed per-pixel terms are ignored). ``bw_util``/``alu_util`` divide
    achieved rates by the chip ceilings above; ``bound`` names the larger.

    The table covers EVERY stage of ``pair_core`` — the six volume
    kernels plus the per-pixel stages (normalise / validity margins /
    band-recovery cross-checker / blunder gates / triangulate+plane
    finalise). Stages are timed in isolation, so ``stages_sum_ms`` is an
    upper bound on the fused whole-program ``core_ms`` (XLA overlaps and
    fuses across stage boundaries in the real executable); the gap
    between the two is the fusion/overlap dividend, not unaccounted work.
    """
    import jax
    import jax.numpy as jnp

    from pcmi_tpu.ops.morphology import binary_dilation
    from pcmi_tpu.ops.normalize import normalise_image
    from pcmi_tpu.ops.stereo.matching import (
        build_cost_volume,
        derive_right_volume,
        lr_consistency,
        refine_disparity,
        sgm_aggregate,
        wta_disparity,
        DisparityResult,
    )
    from pcmi_tpu.pipelines.height_map import photoconsistency

    mask1 = r1 >= 0
    mask2 = r2 >= 0
    n1, _ = normalise_image(r1, mask1, subsample=cfg.norm_subsample)
    n2, _ = normalise_image(r2, mask2, subsample=cfg.norm_subsample)
    v1 = mask1 & ~binary_dilation(~mask1, iterations=cfg.margin_undefined)
    v2 = mask2 & ~binary_dilation(~mask2, iterations=cfg.margin_undefined)
    h, w = n1.shape
    stride = cfg.disp_stride
    D = cfg.max_disp // stride          # volume slices actually built
    P = h * w
    bpe = 2 if jax.default_backend() == "tpu" else 4  # stored volume dtype

    # precomputed stage inputs (once, not timed)
    vol = jax.jit(lambda: build_cost_volume(n1, n2, v1, v2, cfg))()
    agg = jax.jit(lambda: sgm_aggregate(vol, cfg))()
    disp_l, cost_l, margin = jax.jit(
        lambda: wta_disparity(agg, cfg.min_disparity, with_margin=True,
                              stride=stride))()
    agg_r = jax.jit(lambda: sgm_aggregate(
        derive_right_volume(vol, cfg.min_disparity, stride=stride),
        cfg, dirs="h"))()
    disp_r, _ = jax.jit(
        lambda: wta_disparity(agg_r, cfg.min_disparity, subpixel=False,
                              stride=stride))()
    res = DisparityResult(disparity=disp_l, valid=v1, cost=cost_l,
                          disparity_right=disp_r, margin=margin,
                          check_disparity=None)
    jax.block_until_ready((agg, disp_r))

    # (label, fn(eps)->reducible, est bytes, est ops) — traffic models:
    dmax = cfg.min_disparity + cfg.max_disp - 1
    stages = [
        # per (d, px): read right/valid/census slices + left planes ~21 B,
        # separable box ~2 f32 passes ~16 B, volume write bpe; ops: census
        # hamming+mix ~17 + box 2*block adds
        ("cost_volume",
         lambda e: build_cost_volume(n1 + e, n2, v1, v2, cfg),
         D * P * (37 + bpe), D * P * (2 * cfg.block_size + 17)),
        # 4 directional passes (read+write bpe each) + final 4-way sum;
        # ops: ~8/elem/direction recurrence + 3 adds for the sum
        ("sgm",
         lambda e: sgm_aggregate(vol + e.astype(vol.dtype), cfg),
         D * P * (4 * 2 * bpe + 5 * bpe), D * P * 35),
        # fused single-pass WTA (read bpe; margin+parabola in-register)
        ("wta",
         lambda e: wta_disparity(agg + e.astype(agg.dtype),
                                 cfg.min_disparity, with_margin=True,
                                 stride=stride)[0],
         D * P * bpe, D * P * 8),
        # derive (read+write) + 2-path SGM + integer WTA on the right view
        ("right_view",
         lambda e: wta_disparity(
             sgm_aggregate(derive_right_volume(
                 vol + e.astype(vol.dtype), cfg.min_disparity,
                 fill=1e4, stride=stride), cfg, dirs="h"),
             cfg.min_disparity, subpixel=False, stride=stride)[0],
         D * P * (2 * bpe + 2 * 2 * bpe + 3 * bpe + bpe), D * P * 25),
        # L/R check: D/stride passes of read-slice + masked accumulate
        ("lr_check",
         lambda e: lr_consistency(disp_l + e, disp_r, cfg.lr_threshold_eff,
                                  cfg.min_disparity, dmax, stride=stride),
         (cfg.max_disp // stride) * P * 12, (cfg.max_disp // stride) * P * 6),
        # guided-filter refinement (D-independent) + photoconsistency
        # (D/stride elementwise passes)
        ("refine_photo",
         lambda e: photoconsistency(
             n1, n2, refine_disparity(
                 res._replace(disparity=res.disparity + e), n1,
                 cfg).disparity,
             d_min=cfg.min_disparity, d_max=dmax, stride=stride),
         (cfg.max_disp // stride) * P * 12 + 60 * P * 4,
         (cfg.max_disp // stride) * P * 8 + 60 * P * 4),
        # radiometric normalisation x2: min/max reduce + two 2-stage
        # 64-bin grid medians per image (~9 read passes) + rescale write
        ("normalise",
         lambda e: normalise_image(r1 + e, mask1,
                                   subsample=cfg.norm_subsample)[0]
         + normalise_image(r2 + e, mask2, subsample=cfg.norm_subsample)[0],
         2 * P * 53, 2 * P * 1600),
        # validity-margin poisoning: one (2*it+1)^2 reduce_window per image
        ("validity",
         lambda e: binary_dilation(~((r1 + e) >= 0),
                                   iterations=cfg.margin_undefined)
         ^ binary_dilation(~mask2, iterations=cfg.margin_undefined),
         2 * P * 8, 2 * P * (2 * cfg.margin_undefined + 1) ** 2),
    ]

    # band-recovery cross-checker: a second (small-support) matcher pass —
    # census volume + WTA ("census" mode) or + vertical box + 2-path
    # vertical SGM ("vertical" mode); see matching.compute_disparity
    if cfg.band_recover:
        import dataclasses as _dc

        from pcmi_tpu.ops.stereo.matching import _vertical_box

        if cfg.band_check_mode == "vertical":
            cfg_v = _dc.replace(cfg, block_size=1,
                                census_window=cfg.band_check_census)

            def _checker(e):
                vol_s = build_cost_volume(n1 + e, n2, v1, v2, cfg_v)
                vol_s = _vertical_box(vol_s, cfg.band_check_vbox)
                vol_s = sgm_aggregate(vol_s, cfg_v, dirs="v")
                return wta_disparity(vol_s, cfg.min_disparity, stride=stride,
                                     with_margin=True)[0]

            stages.append(("checker", _checker,
                           D * P * (12 + 3 * 2 * bpe + 2 * 2 * bpe + bpe),
                           D * P * 30))
        else:
            cfg_c = _dc.replace(cfg, block_size=cfg.band_check_block,
                                census_window=cfg.band_check_census)

            def _checker(e):
                vol_s = build_cost_volume(n1 + e, n2, v1, v2, cfg_c)
                return wta_disparity(vol_s, cfg.min_disparity,
                                     stride=stride)[0]

            stages.append(("checker", _checker,
                           D * P * (12 + 2 * bpe),
                           D * P * (2 * cfg.band_check_block + 10)))

    # blunder gates: speckle median + gradient/band dilation + adaptive
    # photo floor (one grid-median pass) — all P-sized, D-independent
    from pcmi_tpu.ops.filters import separable_median_filter
    from pcmi_tpu.ops.normalize import masked_median_grid

    photo = jax.jit(lambda: photoconsistency(
        n1, n2, res.disparity, d_min=cfg.min_disparity, d_max=dmax,
        stride=stride))()

    def _gates(e):
        d = res.disparity + e
        med = separable_median_filter(d, cfg.speckle_median_size)
        ok = jnp.abs(d - med) <= cfg.speckle_threshold
        gy, gx = jnp.gradient(med)
        band = binary_dilation(jnp.hypot(gy, gx) > cfg.edge_grad_threshold,
                               iterations=cfg.edge_dilation)
        floor = masked_median_grid(photo, res.valid & v1, 0.0, 2.0)
        photo_ok = photo < jnp.maximum(jnp.float32(cfg.photo_threshold),
                                       cfg.photo_adapt_factor * floor)
        return res.valid & ok & ~band & photo_ok

    stages.append(("gates", _gates, P * 64,
                   P * (6 * cfg.speckle_median_size + 64 * 3 + 60)))

    # finalise: triangulation + SVD plane fit + grid quantiles + clips
    from pcmi_tpu.geometry.rectify import triangulate_from_operator
    from pcmi_tpu.ops.normalize import masked_quantile_grid
    from pcmi_tpu.ops.pointcloud import fit_plane, plane_relative_height

    def _finalise(e):
        xyz = triangulate_from_operator(res.disparity + e, M, b)
        valid = res.valid & v1
        height = jnp.where(valid, xyz[..., 2], jnp.nan)
        plane = fit_plane(xyz, valid.astype(jnp.float32))
        rel = plane_relative_height(xyz, plane)
        rlo = jnp.min(jnp.where(valid, rel, jnp.inf))
        rhi = jnp.max(jnp.where(valid, rel, -jnp.inf))
        rlo = jnp.where(jnp.isfinite(rlo), rlo, 0.0)
        rhi = jnp.where(jnp.isfinite(rhi), jnp.maximum(rhi, rlo + 1e-6), 1.0)
        q0 = masked_quantile_grid(rel, valid, rlo, rhi, 0.02)
        q1 = masked_quantile_grid(rel, valid, rlo, rhi, 0.98)
        return height + jnp.clip(rel - q0, None, q1 - q0)

    stages.append(("finalise", _finalise, P * 80, P * 1100))

    probe = jax.jit(lambda: jnp.float32(1.0))
    float(probe())
    t0 = time.perf_counter()
    float(probe())
    rtt = time.perf_counter() - t0

    out = {}
    total_ms = 0.0
    for label, fn, est_bytes, est_ops in stages:
        @jax.jit
        def rep():
            def body(c, _):
                o = fn(c * jnp.float32(1e-20))
                leaves = jax.tree_util.tree_leaves(o)
                s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        float(rep())  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(rep())
            best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
        dt = best / k
        total_ms += dt * 1e3
        if dt < 50e-6:
            # below the RTT-subtraction noise floor: the stage fused to
            # (near) nothing in isolation; a utilization ratio against a
            # garbage denominator would be meaningless
            out[label] = {
                "ms": round(dt * 1e3, 3),
                "est_gb": round(est_bytes / 1e9, 3),
                "bound": "sub-noise",
            }
            continue
        bw = est_bytes / dt / PEAK_HBM_B_S
        alu = est_ops / dt / PEAK_VPU_OP_S
        out[label] = {
            "ms": round(dt * 1e3, 3),
            "est_gb": round(est_bytes / 1e9, 3),
            "bw_util": round(bw, 3),
            "alu_util": round(alu, 3),
            "bound": "hbm" if bw >= alu else "vpu",
        }
    out["stages_sum_ms"] = round(total_ms, 2)
    return out


def _bench_fusion(n_points: int = 1 << 22, k_rep: int = 8):
    """Multi-day fusion throughput: robust DSM gridding of scattered points.

    Times :func:`pcmi_tpu.pipelines.streaming.dsm_update` (segment-sum
    scatter + 3-round tile-local sigma rejection — the accumulation every
    streamed tile pays) over ``n_points`` synthetic points on a 1024x1024
    1 m grid, K in-graph repeats per dispatch. Reported as points/sec
    (the BASELINE.json fusion metric).
    """
    import jax
    import jax.numpy as jnp

    from pcmi_tpu.pipelines.streaming import StreamingDSM, dsm_update

    rng = np.random.default_rng(7)
    ny = nx = 1024
    xy = jnp.asarray(
        rng.uniform(0, [nx * 1.0, ny * 1.0], (n_points, 2)).astype(np.float32))
    values = jnp.asarray(
        (rng.normal(20.0, 5.0, n_points)
         + np.where(rng.uniform(size=n_points) < 0.02,
                    rng.normal(0, 80.0, n_points), 0.0)).astype(np.float32))
    weights = jnp.ones((n_points,), jnp.float32)
    acc0 = StreamingDSM(wsum=jnp.zeros((ny, nx)), vsum=jnp.zeros((ny, nx)),
                        vsq=jnp.zeros((ny, nx)))

    @jax.jit
    def rep(xy, values, weights):
        def body(carry, _):
            acc = dsm_update(
                acc0, xy + carry * 1e-20, values, weights,
                (0.0, 0.0), 1.0, (ny, nx), robust_sigma=3.0)
            return carry + jnp.sum(acc.vsum), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_rep)
        return c

    float(rep(xy, values, weights))  # compile + warm
    probe = jax.jit(lambda: jnp.float32(1.0))
    float(probe())
    t0 = time.perf_counter()
    float(probe())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(rep(xy, values, weights))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / k_rep
    return {
        "n_points": n_points,
        "grid": [ny, nx],
        "points_per_s": round(n_points / dt, 0),
        "ms_per_update": round(dt * 1e3, 2),
    }


def _bench_families():
    """Accuracy per synthetic scene family (urban / steep / low-texture /
    noisy / cross-date — ``pcmi_tpu.geometry.synthetic.SCENE_FAMILIES``).

    All families share shapes and geometry-derived config, so ONE compiled
    pair_core executable serves the whole sweep. Gates: RMSE ≤ 1 m per
    family plus per-family completeness floors (lowtex is a per-pixel
    SNR ~ 1 scene where the noise-adaptive gates trade coverage for
    accuracy — see tests/test_scene_families.py).

    Runs with ``disp_stride=2`` — the PRODUCTION fast path the D=288
    envelope ships with (VERDICT r3 item 3: the fast path must be
    family-swept, not one-scene-validated).
    """
    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.synthetic import SCENE_FAMILIES, make_family_scene
    from pcmi_tpu.pipelines.evaluation import evaluate_pair_accuracy

    h_range = (0.0, 40.0)
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5,
                            margin_undefined=8, disp_stride=2),
        rectify=RectifyConfig(height_range=h_range),
    )
    floors = {"lowtex": 0.02, "noisy": 0.45}
    out = {}
    for family in sorted(SCENE_FAMILIES):
        scene = make_family_scene(family, seed=11, out_shape=(448, 448),
                                  ground_shape=(640, 640), h_range=h_range)
        score = evaluate_pair_accuracy(scene, cfg)
        floor = floors.get(family, 0.5)
        out[family] = {
            "rmse_m": round(score["rmse_m"], 3),
            "bias_m": round(score["bias_m"], 3),
            "completeness": round(score["completeness"], 3),
            "pass": bool(score["rmse_m"] <= 1.0
                         and score["completeness"] >= floor),
        }
    out["lowtex_fused"] = _bench_lowtex_fused()
    return out


def _bench_lowtex_fused():
    """Low-texture coverage through multi-date fusion (VERDICT r3 item 2:
    the evidence behind the lowtex single-pair completeness floor).

    Single-pair strict gates keep ~2% of a per-pixel-SNR~1 scene (their
    thresholds sit below the matcher noise there — measured: relaxing
    them per-pair admits CORRELATED garbage that the cross-pair median
    cannot clean, RMSE 3-6 m). The production recipe instead matches
    PRESMOOTHED inputs with L/R-only per-pair validity
    (``gate_profile="lr"``: per-pair median |error| 0.3-0.5 m over ~65%
    of the observable) and lets the CROSS-PAIR consistency mask
    (min_pairs=5 of 12 pairs, MAD ≤ 0.7 m) reject what the acquisition
    geometries do not agree on. Gate: fused completeness ≥ 0.5 of the
    truth-covered grid at RMSE ≤ 1 m.
    """
    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.pairs import ImageMeta
    from pcmi_tpu.geometry.synthetic import (
        aoi_lonlat_ranges,
        make_family_scene,
    )
    from pcmi_tpu.pipelines.multiday import fused_consistency_dsm

    views = ((12.0, 90.0), (22.0, 260.0), (16.0, 175.0), (26.0, 15.0),
             (19.0, 305.0), (11.0, 215.0), (24.0, 130.0), (14.0, 40.0))
    h_range = (0.0, 40.0)
    cell = 1.5
    scene = make_family_scene("lowtex", seed=11, out_shape=(448, 448),
                              ground_shape=(448, 448), h_range=h_range,
                              views=views)
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5,
                            margin_undefined=8, gate_profile="lr",
                            presmooth_sigma=1.5),
        rectify=RectifyConfig(height_range=h_range))
    metas = [ImageMeta(i, inc, az, date=20.0 * i)
             for i, (inc, az) in enumerate(views)]
    terr = np.asarray(scene.terrain)
    hg, wg = terr.shape
    ny = int(hg * scene.ground_gsd / cell)
    nx = int(wg * scene.ground_gsd / cell)
    dsm, _cnt, _np_ = fused_consistency_dsm(
        scene.images, scene.rpcs, metas, *aoi_lonlat_ranges(scene),
        cfg, scene.ground_origin, (ny, nx), cell,
        n_pairs=12, min_pairs=5, mad_max=0.7)
    gxc = (np.arange(nx) + 0.5) * cell / scene.ground_gsd
    gyc = (np.arange(ny) + 0.5) * cell / scene.ground_gsd
    gxm, gym = np.meshgrid(gxc, gyc)
    inb = (gxm >= 0) & (gxm < wg - 1) & (gym >= 0) & (gym < hg - 1)
    tt = terr[np.clip(gym.astype(int), 0, hg - 1),
              np.clip(gxm.astype(int), 0, wg - 1)]
    filled = np.isfinite(dsm) & inb
    err = dsm[filled] - tt[filled]
    rmse = float(np.sqrt(np.mean(err**2))) if filled.any() else float("nan")
    comp = float(filled.sum() / max(inb.sum(), 1))
    return {
        "pairs": 12,
        "min_pairs": 5,
        "mad_max_m": 0.7,
        "grid_cell_m": cell,
        "completeness": round(comp, 4),
        "rmse_m": round(rmse, 3),
        "pass": bool(comp >= 0.5 and rmse <= 1.0),
    }


def _bench_d288():
    """Flagship at the reference's full MAX_DISP=288 search envelope.

    Three operating points, reflecting the round-4 study of this scene:

    * ``strict`` — the production single-pair default (disp_stride=2,
      strict blunder gates): the TIMED headline, RMSE ≤ 1 m.
    * ``dense`` — the vertical-support cross-checker recovery
      (``band_check_mode="vertical"``): +7-8 points of completeness per
      pair, at the cost of admitting ~1.5% two-view PHANTOM matches
      (both views agree on a wrong correspondence over quasi-periodic
      texture — measured unidentifiable from any single-pair evidence:
      they pass strict L/R both ways, photoconsistency, every margin
      gate and two independent checkers).
    * ``fused`` — 10 dense pairs from 5 views, cross-pair-median DSM at
      min_pairs=2: different acquisition geometries decorrelate the
      phantoms, so the median kills them. This is the production answer
      to the completeness-vs-accuracy frontier (and the capability the
      reference advertises: multi-day reconstruction, ``README.md:17``).
      Gate: completeness ≥ 0.65 AND RMSE ≤ 1 m on cell-centre truth.
    """
    import itertools

    import jax
    import jax.numpy as jnp

    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.rectify import triangulation_operator
    from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
    from pcmi_tpu.pipelines.evaluation import truth_on_grid
    from pcmi_tpu.pipelines.height_map import (
        HeightMapPipeline,
        _rectify_pair,
        pair_core,
    )
    from pcmi_tpu.pipelines.streaming import (
        StreamingDSM,
        dsm_finalize_multi,
        dsm_update,
    )

    h_range = (0.0, 48.0)
    scene = make_stereo_scene(
        seed=3, out_shape=(896, 896), ground_shape=(768, 768), gsd=0.2,
        h_range=h_range,
        views=((25.0, 80.0), (35.0, 250.0), (30.0, 160.0),
               (20.0, 20.0), (28.0, 305.0)),
        terrain_kwargs=dict(terrain_fraction=0.6, building_size_px=(50, 125),
                            building_h_m=(8.0, 18.0)),
    )
    terr = np.asarray(scene.terrain)
    ox, oy = scene.ground_origin

    def pair_accuracy(prod):
        valid = np.asarray(prod.valid)
        truth, inb = truth_on_grid(scene, prod.xyz)
        m = valid & inb
        err = np.asarray(prod.height)[m] - truth[m]
        rmse = float(np.sqrt(np.mean(err**2))) if m.any() else float("nan")
        observable = ((np.asarray(prod.rect_left) >= 0)
                      & (np.asarray(prod.rect_right) >= 0))
        return rmse, float(valid.sum() / max(observable.sum(), 1))

    out = {}
    # --- strict: timed single-pair headline (first stereo pair) ---
    cfg_s = PipelineConfig(
        stereo=StereoConfig(block_size=9, census_window=5, margin_undefined=8,
                            # coarse-stride search: every 2nd disparity at
                            # full resolution — measured RMSE cost 0.01 m
                            # at this envelope for ~1.7x the throughput
                            disp_stride=2),
        rectify=RectifyConfig(height_range=h_range),
    )
    pipe = HeightMapPipeline(cfg_s)
    geom = pipe.build_geometry(
        scene.rpcs[0], scene.rpcs[1], *aoi_lonlat_ranges(scene),
        scene.images[0].shape, scene.images[1].shape,
    )
    stereo_cfg = pipe.stereo_cfg_for([geom])
    r1, r2 = _rectify_pair(
        scene.images[0], scene.images[1],
        jnp.asarray(geom.H1, jnp.float32), jnp.asarray(geom.H2, jnp.float32),
        geom.out_shape,
    )
    M, b = triangulation_operator(geom)
    dt, prod = _device_time_per_frame(pair_core, r1, r2, M, b, stereo_cfg,
                                      k=5)
    h, w = geom.out_shape
    from pcmi_tpu.pipelines.height_map import PairProduct
    prod_t = PairProduct(disparity=None, valid=prod[2], photo=None,
                         xyz=prod[1], height=prod[0], rel_height=None,
                         rect_left=r1, rect_right=r2)
    rmse_s, vf_s = pair_accuracy(prod_t)
    out["strict"] = {
        "canvas": [h, w],
        "max_disp": stereo_cfg.max_disp,
        "mpix_s": round(h * w / dt / 1e6, 3),
        "height_rmse_m": round(rmse_s, 3),
        "valid_fraction": round(vf_s, 4),
    }

    # --- dense + fused: 10 pairs, cross-pair median DSM ---
    cfg_d = cfg_s.replace(stereo=dataclasses_replace(
        cfg_s.stereo, band_check_mode="vertical"))
    pipe_d = HeightMapPipeline(cfg_d)
    pairs = list(itertools.combinations(range(5), 2))
    geoms = [pipe_d.build_geometry(
        scene.rpcs[i], scene.rpcs[j], *aoi_lonlat_ranges(scene),
        scene.images[i].shape, scene.images[j].shape) for i, j in pairs]
    scfg_d = pipe_d.stereo_cfg_for(geoms)
    cell = 0.6
    hg, wg = terr.shape
    ny = int(hg * scene.ground_gsd / cell)
    nx = int(wg * scene.ground_gsd / cell)
    accs = []
    dense_stats = []
    for (i, j), g in zip(pairs, geoms):
        p = pipe_d.process_pair(scene.images[i], scene.images[j], g, scfg_d,
                                with_plane=False)
        dense_stats.append(pair_accuracy(p))
        xyz = np.asarray(p.xyz).reshape(-1, 3)
        wgt = np.asarray(p.valid).reshape(-1).astype(np.float32)
        acc = StreamingDSM(wsum=jnp.zeros((ny, nx)), vsum=jnp.zeros((ny, nx)),
                           vsq=jnp.zeros((ny, nx)))
        accs.append(dsm_update(acc, jnp.asarray(xyz[:, :2]),
                               jnp.asarray(xyz[:, 2]), jnp.asarray(wgt),
                               (ox, oy), cell, (ny, nx), robust_sigma=3.0))
    out["dense"] = {
        "pairs": len(pairs),
        "mean_rmse_m": round(float(np.mean([r for r, _ in dense_stats])), 3),
        "mean_completeness": round(
            float(np.mean([c for _, c in dense_stats])), 4),
    }

    # --- fused-pipeline throughput: what the production multi-date answer
    # actually costs per pair = dense pair core + robust DSM update (the
    # cross-pair median finalisation is one pass over P pairs' grids,
    # amortised to noise). Timed with the same k-rep scan discipline. ---
    g0 = geoms[0]
    rd1, rd2 = _rectify_pair(
        scene.images[pairs[0][0]], scene.images[pairs[0][1]],
        jnp.asarray(g0.H1, jnp.float32), jnp.asarray(g0.H2, jnp.float32),
        g0.out_shape,
    )
    Md, bd = triangulation_operator(g0)
    dt_dense, prod_d = _device_time_per_frame(
        pair_core, rd1, rd2, Md, bd, scfg_d, k=5)
    hd, wd = g0.out_shape
    xyz0 = jnp.asarray(np.asarray(prod_d[1]).reshape(-1, 3))
    wgt0 = jnp.asarray(np.asarray(prod_d[2]).reshape(-1).astype(np.float32))
    acc00 = StreamingDSM(wsum=jnp.zeros((ny, nx)), vsum=jnp.zeros((ny, nx)),
                         vsq=jnp.zeros((ny, nx)))
    import time as _time

    ku = 6

    @jax.jit
    def upd_rep():
        def body(c, _):
            a = dsm_update(acc00, xyz0[:, :2] + c * 1e-20, xyz0[:, 2], wgt0,
                           (ox, oy), cell, (ny, nx), robust_sigma=3.0)
            return c + jnp.sum(a.wsum), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ku)
        return c

    float(upd_rep())  # compile + warm
    rtt_probe = jax.jit(lambda: jnp.float32(1.0))
    float(rtt_probe())
    t0u = _time.perf_counter()
    float(rtt_probe())
    rtt_u = _time.perf_counter() - t0u
    best_up = float("inf")
    for _ in range(2):
        t0u = _time.perf_counter()
        float(upd_rep())
        best_up = min(best_up,
                      max(_time.perf_counter() - t0u - rtt_u, 1e-9))
    best_up /= ku
    out["fused_pipeline"] = {
        "pair_core_ms": round(dt_dense * 1e3, 2),
        "dsm_update_ms": round(best_up * 1e3, 2),
        "mpix_s": round(hd * wd / (dt_dense + best_up) / 1e6, 3),
    }

    dsm, _cnt, _np_ = dsm_finalize_multi(accs, min_pairs=3)
    gxc = (np.arange(nx) + 0.5) * cell / scene.ground_gsd
    gyc = (np.arange(ny) + 0.5) * cell / scene.ground_gsd
    gxm, gym = np.meshgrid(gxc, gyc)
    inb = (gxm >= 0) & (gxm < wg - 1) & (gym >= 0) & (gym < hg - 1)
    tt = terr[np.clip(gym.astype(int), 0, hg - 1),
              np.clip(gxm.astype(int), 0, wg - 1)]
    filled = np.isfinite(dsm) & inb
    err = dsm[filled] - tt[filled]
    rmse_f = float(np.sqrt(np.mean(err**2))) if filled.any() else float("nan")
    comp_f = float(filled.sum() / max(inb.sum(), 1))
    out["fused"] = {
        "min_pairs": 3,
        "grid_cell_m": cell,
        "completeness": round(comp_f, 4),
        "rmse_m": round(rmse_f, 3),
        "tail_gt2m": round(float((np.abs(err) > 2).mean()), 4)
        if filled.any() else None,
    }
    out["gates"] = {
        "strict_rmse_le_1m": bool(rmse_s <= 1.0),
        "strict_valid_fraction_ge_0.5": bool(vf_s >= 0.5),
        "fused_completeness_ge_0.65": bool(comp_f >= 0.65),
        "fused_rmse_le_1m": bool(rmse_f <= 1.0),
    }
    return out


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


if __name__ == "__main__":
    main()
