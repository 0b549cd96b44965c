"""Pallas SGM kernel parity vs the XLA scan formulation (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from pcmi_tpu.config import StereoConfig
from pcmi_tpu.ops.stereo.matching import sgm_aggregate
from pcmi_tpu.ops.stereo.pallas_kernels import (
    sgm_aggregate_pallas,
    sgm_aggregate_pallas_blocked,
    sgm_aggregate_pallas_sub,
)


def test_sgm_pallas_blocked_matches_xla_scan(rng):
    """The contiguous-band blocked kernel must be bit-close to the scan."""
    for (d, h, w) in [(16, 24, 40), (20, 19, 33)]:
        vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
        cfg = StereoConfig(max_disp=32, sgm_backend="xla")
        ref = np.asarray(sgm_aggregate(jnp.asarray(vol), cfg))
        got = np.asarray(sgm_aggregate_pallas_blocked(
            jnp.asarray(vol), cfg.sgm_p1, cfg.sgm_p2, chunk=8))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_sgm_pallas_matches_xla_scan(rng):
    d, h, w = 16, 24, 40
    vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
    cfg = StereoConfig(max_disp=16, sgm_backend="xla")
    ref = np.asarray(sgm_aggregate(jnp.asarray(vol), cfg))
    got = np.asarray(
        sgm_aggregate_pallas(jnp.moveaxis(jnp.asarray(vol), 0, -1),
                             cfg.sgm_p1, cfg.sgm_p2)
    )
    got = np.moveaxis(got, -1, 0)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_sgm_pallas_sub_matches_xla_scan(rng):
    """The sublane-disparity kernel (the TPU default) must be bit-close."""
    d, h, w = 16, 24, 40
    vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
    cfg = StereoConfig(max_disp=16, sgm_backend="xla")
    ref = np.asarray(sgm_aggregate(jnp.asarray(vol), cfg))
    got = np.asarray(
        sgm_aggregate_pallas_sub(jnp.asarray(vol), cfg.sgm_p1, cfg.sgm_p2,
                                 band=8, chunk=8)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_sgm_pallas_sub_nonaligned(rng):
    d, h, w = 20, 19, 33
    vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
    cfg = StereoConfig(max_disp=32, sgm_backend="xla")
    ref = np.asarray(sgm_aggregate(jnp.asarray(vol), cfg))
    got = np.asarray(
        sgm_aggregate_pallas_sub(jnp.asarray(vol), cfg.sgm_p1, cfg.sgm_p2,
                                 band=8, chunk=8)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_sgm_pallas_nonaligned_shapes(rng):
    # shapes not multiples of the block sizes exercise the padding path
    d, h, w = 20, 19, 33
    vol = rng.uniform(0, 1, (d, h, w)).astype(np.float32)
    cfg = StereoConfig(max_disp=32, sgm_backend="xla")
    ref = np.asarray(sgm_aggregate(jnp.asarray(vol), cfg))
    got = np.moveaxis(np.asarray(
        sgm_aggregate_pallas(jnp.moveaxis(jnp.asarray(vol), 0, -1),
                             cfg.sgm_p1, cfg.sgm_p2)
    ), -1, 0)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_wta_fused_parity(rng):
    """Fused single-pass WTA == XLA WTA (disp/best/margin), incl. ties,
    boundary argmins and stride decoding (interpret mode on CPU)."""
    import jax.numpy as jnp

    from pcmi_tpu.ops.stereo.matching import wta_disparity
    from pcmi_tpu.ops.stereo.pallas_kernels import wta_fused_pallas

    vol = rng.uniform(0.2, 1.0, (24, 40, 200)).astype(np.float32)
    vol[0, :8] = 0.01     # boundary argmin cases
    vol[23, 8:16] = 0.01
    vol[5, 20:] = vol[9, 20:]  # ties across disparities
    v = jnp.asarray(vol)
    for stride, sub in [(1, True), (2, True), (1, False)]:
        d1, b1, m1 = wta_fused_pallas(v, -12, stride=stride, subpixel=sub)
        d0, b0, m0 = wta_disparity(v, -12, with_margin=True, subpixel=sub,
                                   stride=stride, backend="xla")
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-6)


def test_derive_right_pallas_parity(rng):
    """DMA-pipe right-volume derivation == XLA scan form, bit-exact."""
    import jax.numpy as jnp

    from pcmi_tpu.ops.stereo.pallas_kernels import derive_right_pallas

    vol = jnp.asarray(rng.uniform(0, 1, (24, 50, 300)).astype(np.float32))
    D, h, w = vol.shape
    for d_min, stride, fill in [(-12, 1, 1.0), (-24, 2, 1e4), (0, 1, 1.0)]:
        got = np.asarray(derive_right_pallas(vol, d_min, fill=fill,
                                             stride=stride))
        pad = max(abs(d_min), abs(d_min + (D - 1) * stride)) + 1
        volp = np.pad(np.asarray(vol), ((0, 0), (0, 0), (pad, pad)),
                      constant_values=fill)
        ref = np.stack([volp[i, :, pad + d_min + i * stride:
                             pad + d_min + i * stride + w]
                        for i in range(D)])
        np.testing.assert_array_equal(got, ref)


def test_right_disparity_fused_parity(rng):
    """Fused derive->2-path-SGM->argmin == the unfused chain, exactly.

    The fused kernel replaces ``sgm_aggregate(derive_right_volume(...),
    dirs="h")`` + integer WTA inside ``compute_disparity``; its contract
    is bit-parity (same derive, same direction kernels, bf16-faithful
    add, argmin tie-break = lowest index)."""
    import jax.numpy as jnp

    from pcmi_tpu.ops.stereo.matching import (
        derive_right_volume,
        sgm_aggregate,
        wta_disparity,
    )
    from pcmi_tpu.ops.stereo.pallas_kernels import right_disparity_fused_pallas

    cfg = StereoConfig(max_disp=16, sgm_backend="xla")
    for (d, h, w), stride in [((16, 24, 40), 1), ((16, 19, 33), 2)]:
        vol = jnp.asarray(rng.uniform(0, 1, (d, h, w)).astype(np.float32))
        agg = sgm_aggregate(
            derive_right_volume(vol, cfg.min_disparity, stride=stride),
            cfg, dirs="h")
        ref, _ = wta_disparity(agg, cfg.min_disparity, subpixel=False,
                               stride=stride, backend="xla")
        got = right_disparity_fused_pallas(
            vol, cfg.sgm_p1, cfg.sgm_p2, cfg.min_disparity, stride=stride,
            band=8, chunk=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_diagonal_right_parity(rng):
    """with_aggregate S + diagonal argmin == the "derived" reference chain.

    ``right_sgm="diagonal"`` contract: ``sgm4_wta_fused_pallas(...,
    with_aggregate=True)`` emits the combined aggregate S and
    ``diag_right_disparity_wdh`` computes the same integer disparities as
    ``wta_disparity(derive_right_volume(sgm_aggregate(vol), fill=1e4))``
    (OpenCV SGBM's disp2 recipe). f32 volumes -> exact equality (the
    kernel combine is the same two-operand f32 sum, commuted)."""
    from pcmi_tpu.ops.stereo.matching import (
        derive_right_volume,
        diag_right_disparity_wdh,
        wta_disparity,
    )
    from pcmi_tpu.ops.stereo.pallas_kernels import sgm4_wta_fused_pallas

    cfg = StereoConfig(max_disp=16, sgm_backend="xla")
    for (d, h, w), stride, d_min in [((16, 24, 40), 1, 0),
                                     ((16, 19, 33), 2, -4)]:
        vol = jnp.asarray(rng.uniform(0, 1, (d, h, w)).astype(np.float32))
        agg_l = sgm_aggregate(vol, cfg)
        agg_r = derive_right_volume(agg_l, d_min, fill=1e4, stride=stride)
        ref, _ = wta_disparity(agg_r, d_min, subpixel=False, stride=stride,
                               backend="xla")
        outs = sgm4_wta_fused_pallas(
            vol, cfg.sgm_p1, cfg.sgm_p2, d_min, stride=stride,
            band=8, chunk=8, with_aggregate=True)
        assert len(outs) == 4
        got = diag_right_disparity_wdh(outs[3], d_min, d, h, w,
                                       stride=stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
        # the first three outputs must be untouched by the extra stream
        d0, b0, m0 = sgm4_wta_fused_pallas(
            vol, cfg.sgm_p1, cfg.sgm_p2, d_min, stride=stride,
            band=8, chunk=8)
        np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(d0))
        np.testing.assert_array_equal(np.asarray(outs[2]), np.asarray(m0))


def test_compute_disparity_diagonal_mode(rng):
    """right_sgm="diagonal" end-to-end == right_sgm="derived" + integer WTA
    on the pallas(interpret) backend, and runs on the scan backend too."""
    from pcmi_tpu.ops.stereo.matching import compute_disparity

    left = rng.uniform(0, 1, (40, 64)).astype(np.float32)
    # shift columns by 3 for a plausibly matchable pair
    right = np.roll(left, -3, axis=1).astype(np.float32)
    valid = np.ones((40, 64), bool)
    base = dict(block_size=5, census_window=5, max_disp=8,
                band_recover=False)
    cfg_diag = StereoConfig(sgm_backend="pallas", right_sgm="diagonal",
                            **base)
    cfg_der = StereoConfig(sgm_backend="pallas", right_sgm="derived",
                           **base)
    l, r, v = jnp.asarray(left), jnp.asarray(right), jnp.asarray(valid)
    out_diag = compute_disparity(l, r, v, v, cfg_diag)
    out_der = compute_disparity(l, r, v, v, cfg_der)
    np.testing.assert_allclose(np.asarray(out_diag.disparity),
                               np.asarray(out_der.disparity), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_diag.disparity_right),
                               np.asarray(out_der.disparity_right),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_diag.valid),
                                  np.asarray(out_der.valid))
    # scan backend accepts the mode (falls back to the derived chain)
    cfg_scan = StereoConfig(sgm_backend="xla", right_sgm="diagonal", **base)
    out_scan = compute_disparity(l, r, v, v, cfg_scan)
    np.testing.assert_allclose(np.asarray(out_scan.disparity_right),
                               np.asarray(out_der.disparity_right),
                               atol=1e-5)


def test_right_disparity_wdh_derive_parity(rng):
    """use_wdh_derive=True (the (W,Dp,H)-layout derive, kept as a
    non-default experiment — see right_disparity_fused_pallas's
    docstring for the compile-time tradeoff) must match the default
    chain exactly, including negative d_min and stride 2."""
    import jax.numpy as jnp

    from pcmi_tpu.ops.stereo.pallas_kernels import right_disparity_fused_pallas

    cfg = StereoConfig(max_disp=16, sgm_backend="xla")
    for (d, h, w), stride, d_min in [((16, 24, 40), 1, 0),
                                     ((16, 19, 33), 2, -4)]:
        vol = jnp.asarray(rng.uniform(0, 1, (d, h, w)).astype(np.float32))
        ref = right_disparity_fused_pallas(
            vol, cfg.sgm_p1, cfg.sgm_p2, d_min, stride=stride,
            band=8, chunk=8)
        got = right_disparity_fused_pallas(
            vol, cfg.sgm_p1, cfg.sgm_p2, d_min, stride=stride,
            band=8, chunk=8, use_wdh_derive=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
