"""Point-cloud fusion ops vs NumPy references and planted ground truth."""

import numpy as np
import jax.numpy as jnp
import jax

from pcmi_tpu.ops import pointcloud as pc


def test_plane_fit_exact(rng):
    n = np.array([0.2, -0.1, 1.0])
    n = n / np.linalg.norm(n)
    u = np.array([1.0, 0.0, -n[0] / n[2]])
    v = np.cross(n, u)
    ab = rng.uniform(-50, 50, (5000, 2))
    pts = ab[:, :1] * u + ab[:, 1:] * v + np.array([3.0, -7.0, 12.0])
    plane = pc.fit_plane(jnp.asarray(pts, jnp.float32), jnp.ones(5000))
    got = np.asarray(plane.normal)
    assert abs(abs(got @ n) - 1.0) < 1e-4
    h = np.asarray(pc.plane_relative_height(jnp.asarray(pts, jnp.float32), plane))
    assert np.abs(h).max() < 1e-2


def test_plane_fit_ignores_masked(rng):
    pts = np.zeros((1000, 3))
    pts[:, :2] = rng.uniform(-10, 10, (1000, 2))
    w = np.ones(1000)
    # poison half the points, weight them out
    pts[500:, 2] = rng.uniform(50, 100, 500)
    w[500:] = 0.0
    plane = pc.fit_plane(jnp.asarray(pts, jnp.float32), jnp.asarray(w))
    assert abs(float(plane.normal[2])) > 0.999
    assert abs(float(plane.centroid[2])) < 1e-3


def test_kmeans_recovers_separated_clusters(rng):
    k = 4
    centers = np.array([[0, 0], [30, 0], [0, 30], [30, 30]], np.float32)
    pts = np.concatenate(
        [c + rng.normal(0, 1.0, (200, 2)) for c in centers]
    ).astype(np.float32)
    res = pc.kmeans(jnp.asarray(pts), jnp.ones(len(pts)), k=k, iters=25,
                    key=jax.random.PRNGKey(1))
    got = np.sort(np.asarray(res.centroids), axis=0)
    want = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, want, atol=1.0)
    # inertia ~= within-cluster variance * N * D
    assert float(res.inertia) < len(pts) * 2 * 2.5


def test_kmeans_weights_zero_mask(rng):
    pts = np.concatenate([
        rng.normal(0, 0.5, (300, 2)),
        rng.normal(100, 0.5, (300, 2)),  # masked-out garbage
    ]).astype(np.float32)
    w = np.concatenate([np.ones(300), np.zeros(300)])
    res = pc.kmeans(jnp.asarray(pts), jnp.asarray(w), k=2, iters=20,
                    key=jax.random.PRNGKey(0))
    # both centroids should describe the weighted population near 0
    assert np.abs(np.asarray(res.centroids)).max() < 5.0


def test_knn_mean_distance_vs_numpy(rng):
    pts = rng.uniform(0, 10, (300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    got = np.asarray(pc.knn_mean_distance(jnp.asarray(pts), jnp.asarray(valid),
                                          k=5, chunk=128))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sqrt(np.sort(d2, axis=1)[:, :5]).mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_outlier_mask_flags_planted(rng):
    pts = rng.uniform(0, 20, (800, 3)).astype(np.float32)
    outliers = rng.uniform(200, 300, (20, 3)).astype(np.float32)
    allpts = np.concatenate([pts, outliers])
    valid = np.ones(len(allpts), bool)
    keep = np.asarray(pc.knn_outlier_mask(jnp.asarray(allpts), jnp.asarray(valid),
                                          k=8, sigma=3.0, chunk=256))
    assert keep[:800].mean() > 0.97
    assert keep[800:].sum() == 0


def test_grid_fuse_mean_and_robust(rng):
    # 2x3 grid, cell 1.0; put known samples in cells
    xy = np.array([
        [0.5, 0.5], [0.6, 0.4],        # cell (0,0): values 1, 3 -> mean 2
        [1.5, 0.5],                     # cell (0,1): single 5
        [2.5, 1.5], [2.4, 1.6], [2.6, 1.5],  # cell (1,2): 10,10,400(outlier)
    ], np.float32)
    v = np.array([1.0, 3.0, 5.0, 10.0, 10.0, 400.0], np.float32)
    w = np.ones(6, np.float32)
    dsm, cnt = pc.grid_fuse(jnp.asarray(xy), jnp.asarray(v), jnp.asarray(w),
                            origin=(0.0, 0.0), cell=1.0, shape=(2, 3),
                            robust_sigma=1.0)
    dsm = np.asarray(dsm)
    cnt = np.asarray(cnt)
    assert abs(dsm[0, 0] - 2.0) < 1e-5
    assert abs(dsm[0, 1] - 5.0) < 1e-5
    assert abs(dsm[1, 2] - 10.0) < 1e-5  # outlier rejected by robust pass
    assert np.isnan(dsm[1, 0]) and np.isnan(dsm[0, 2]) and np.isnan(dsm[1, 1])
    assert cnt[0, 0] == 2 and cnt[1, 2] == 3


def test_icp_translation_recovery(rng):
    pts = rng.uniform(0, 50, (1500, 3)).astype(np.float32)
    shift = np.array([2.5, -1.25, 0.75], np.float32)
    src = pts + shift
    valid = np.ones(1500, bool)
    res = pc.icp(jnp.asarray(src), jnp.asarray(valid),
                 jnp.asarray(pts), jnp.asarray(valid),
                 iters=12, chunk=512, mode="translation")
    t = np.asarray(res.t)
    np.testing.assert_allclose(t, -shift, atol=0.15)
    assert float(res.rmse) < 0.5


def test_icp_rigid_recovery(rng):
    pts = rng.uniform(-25, 25, (2000, 3)).astype(np.float32)
    ang = np.radians(4.0)
    R = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ], np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    src = pts @ R.T + t
    valid = np.ones(len(pts), bool)
    res = pc.icp(jnp.asarray(src), jnp.asarray(valid),
                 jnp.asarray(pts), jnp.asarray(valid),
                 iters=15, chunk=512, mode="rigid")
    moved = np.asarray(pc.apply_rigid(jnp.asarray(src), res.R, res.t))
    err = np.linalg.norm(moved - pts, axis=1)
    assert np.median(err) < 0.2


def test_icp_survives_gross_outliers(rng):
    """Registration must hold with 5% planted gross outliers in the source
    cloud: the correspondence gate (quantile trim capped at 4x the median
    distance) keeps them out of the Kabsch update even though they would
    survive a pure quantile trim."""
    pts = rng.uniform(-25, 25, (2000, 3)).astype(np.float32)
    ang = np.radians(3.0)
    R = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ], np.float32)
    t = np.array([1.5, -1.0, 0.8], np.float32)
    src = pts @ R.T + t
    n_out = len(src) // 20          # 5% gross outliers, 100-300 units away
    src[:n_out] += rng.uniform(100, 300, (n_out, 3)).astype(np.float32)
    valid = np.ones(len(pts), bool)
    res = pc.icp(jnp.asarray(src), jnp.asarray(valid),
                 jnp.asarray(pts), jnp.asarray(valid),
                 iters=15, chunk=512, mode="rigid")
    moved = np.asarray(pc.apply_rigid(jnp.asarray(src[n_out:]), res.R, res.t))
    err = np.linalg.norm(moved - pts[n_out:], axis=1)
    assert np.median(err) < 0.3, f"median reg error {np.median(err):.3f}"
    assert float(res.rmse) < 1.0


def test_grid_segment_sums_matches_segment_sum():
    """Compacted cell-sized scatter == point-sized segment_sum (f32 slack)."""
    import jax
    import jax.numpy as jnp

    from pcmi_tpu.ops.segmented import grid_segment_sums, sort_by_segment

    rng = np.random.default_rng(7)
    n, num = 50_000, 1024
    ids = jnp.asarray(rng.integers(0, num, n).astype(np.int32))
    v = jnp.asarray(rng.normal(10.0, 30.0, n).astype(np.float32))
    w = jnp.asarray((rng.uniform(size=n) > 0.3).astype(np.float32))

    ids_s, v_s, w_s, bnd = sort_by_segment(ids, v, w)
    got = np.asarray(grid_segment_sums(
        ids_s, bnd, (w_s, w_s * v_s, w_s * v_s * v_s), num))
    iN, vN, wN = (np.asarray(a, np.float64) for a in (ids_s, v_s, w_s))
    ref = np.zeros((num, 3))
    for col, data in enumerate((wN, wN * vN, wN * vN * vN)):
        np.add.at(ref[:, col], iN.astype(int), data)
    # error bound of the blocked run sums: ~f32 eps x the in-block cumsum
    # magnitude (16384-point blocks) of the min-SHIFTED payload (signed
    # payloads are made non-negative by their global min inside
    # segment_totals_at_points, which inflates the running magnitude) —
    # see ops/segmented.py _LANES. At DSM scales (heights ≤ ~50 m,
    # 0/1 weights) this bound is ~0.1 on cell sums ⇒ ~1 cm on cell means.
    for col, data in enumerate((wN, wN * vN, wN * vN * vN)):
        shifted_mean = (data - min(data.min(), 0.0)).mean()
        bound = 1.5e-7 * 16384 * shifted_mean + 1e-3
        np.testing.assert_allclose(got[:, col], ref[:, col], atol=bound,
                                   rtol=1e-4)
    # empty cells stay exactly zero
    empty = ref[:, 0] == 0
    assert np.all(got[empty] == 0.0)


def test_grid_segment_sums_more_cells_than_points():
    import jax.numpy as jnp

    from pcmi_tpu.ops.segmented import grid_segment_sums, sort_by_segment

    ids = jnp.asarray(np.array([5, 5, 900, 2], np.int32))
    v = jnp.asarray(np.array([1.0, 2.0, 4.0, 8.0], np.float32))
    w = jnp.ones((4,), jnp.float32)
    ids_s, v_s, w_s, bnd = sort_by_segment(ids, v, w)
    out = np.asarray(grid_segment_sums(ids_s, bnd, (w_s, w_s * v_s), 1024))
    assert out[5, 0] == 2.0 and out[5, 1] == 3.0
    assert out[900, 1] == 4.0 and out[2, 1] == 8.0
    assert out.sum() == 4.0 + 15.0
