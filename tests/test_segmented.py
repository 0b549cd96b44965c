"""Sort-segmented reduction ops vs a NumPy per-segment reference."""

import numpy as np
import jax.numpy as jnp

from pcmi_tpu.ops.segmented import (
    robust_sigma_gate,
    segment_totals_at_points,
    sort_by_segment,
)


def _np_segment_totals(ids, vals):
    out = np.zeros_like(vals)
    for u in np.unique(ids):
        m = ids == u
        out[m] = vals[m].sum()
    return out


def test_segment_totals_match_numpy():
    rng = np.random.default_rng(0)
    n = 4096
    ids = rng.integers(0, 300, n).astype(np.int32)
    v = rng.normal(10, 3, n).astype(np.float32)
    w = rng.uniform(0, 1, n).astype(np.float32)

    ids_s, v_s, w_s, boundary = sort_by_segment(
        jnp.asarray(ids), jnp.asarray(v), jnp.asarray(w))
    ws, vs = segment_totals_at_points(boundary, w_s, w_s * v_s)

    # fwd+bwd-self totals: each member accumulates its own f32 rounding, so
    # members of one segment can differ by a few ulps of the running sums
    order = np.argsort(ids, kind="stable")
    np.testing.assert_allclose(
        np.asarray(ws), _np_segment_totals(ids[order], w[order]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(vs), _np_segment_totals(ids[order], (w * v)[order]),
        rtol=1e-4)


def test_singleton_and_empty_segments():
    ids = jnp.asarray([5, 5, 9, 120, 120, 120, 4000], jnp.int32)
    v = jnp.asarray([1.0, 3.0, 7.0, 2.0, 2.0, 8.0, -1.0])
    w = jnp.ones((7,))
    ids_s, v_s, w_s, boundary = sort_by_segment(ids, v, w)
    (ws,) = segment_totals_at_points(boundary, w_s)
    np.testing.assert_allclose(np.asarray(ws), [2, 2, 1, 3, 3, 3, 1])


def test_robust_gate_rejects_outlier_keeps_inliers():
    """A gross outlier inside a well-populated cell is down-weighted to 0;
    clean cells keep every sample (matches the scatter/gather formulation
    this replaced in ``streaming.dsm_update``)."""
    rng = np.random.default_rng(1)
    n = 512
    ids = np.repeat(np.arange(8, dtype=np.int32), n // 8)
    v = rng.normal(20.0, 0.5, n).astype(np.float32)
    v[5] = 500.0  # gross outlier in cell 0
    w0 = np.ones(n, np.float32)

    ids_s, v_s, w_s, boundary = sort_by_segment(
        jnp.asarray(ids), jnp.asarray(v), jnp.asarray(w0))
    w = np.asarray(robust_sigma_gate(boundary, v_s, w_s, sigma=3.0, rounds=3))
    v_sorted = np.asarray(v_s)
    assert w[v_sorted == 500.0].sum() == 0.0          # outlier rejected
    assert w[v_sorted != 500.0].mean() > 0.98         # inliers kept


def test_block_carry_paths(monkeypatch):
    """Segments spanning block boundaries get correct totals: shrink the
    block width so the 4096-element fixture crosses many blocks."""
    import pcmi_tpu.ops.segmented as S

    monkeypatch.setattr(S, "_LANES", 128)
    rng = np.random.default_rng(3)
    n = 2048
    # long segments (avg ~64 members) guarantee many cross-block runs
    ids = np.sort(rng.integers(0, 32, n)).astype(np.int32)
    v = rng.normal(5, 2, n).astype(np.float32)
    w = rng.uniform(0, 1, n).astype(np.float32)
    ids_s, v_s, w_s, boundary = sort_by_segment(
        jnp.asarray(ids), jnp.asarray(v), jnp.asarray(w))
    ws, vs = segment_totals_at_points(boundary, w_s, w_s * v_s)
    order = np.argsort(ids, kind="stable")
    np.testing.assert_allclose(
        np.asarray(ws), _np_segment_totals(ids[order], w[order]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(vs), _np_segment_totals(ids[order], (w * v)[order]),
        rtol=1e-4)
