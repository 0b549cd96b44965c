"""Stitching (synthetic-warp recovery), OBIA, detection-tiling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pcmi_tpu.pipelines.stitching import (
    ImageStitcher,
    dp_seam,
    harris_corners,
    phase_correlation,
    ransac_homography,
    _project,
)
from pcmi_tpu.pipelines.landuse import OBIAClassifier, rgb_to_lab, slic
from pcmi_tpu.pipelines.detection import (
    ObjectDetector,
    nms,
    slice_offsets,
    extract_slices,
)


def _texture(rng, h, w):
    t = rng.uniform(0, 1, (h, w)).astype(np.float32)
    for _ in range(2):
        t = 0.5 * t + 0.25 * np.roll(t, 1, 0) + 0.25 * np.roll(t, 1, 1)
    return t


def test_phase_correlation_recovers_shift(rng):
    img = _texture(rng, 128, 128)
    shifted = np.roll(np.roll(img, 7, 0), -11, 1)
    # convention: returned (dy, dx) is the shift that aligns `b` TO `a`,
    # i.e. the negative of the displacement of b relative to a
    dy, dx = phase_correlation(jnp.asarray(img), jnp.asarray(shifted))
    assert int(dy) == -7 and int(dx) == 11


def test_harris_corners_on_checkerboard():
    ii, jj = np.indices((96, 96))
    img = (ii // 16 + jj // 16) % 2
    pts, vals = harris_corners(jnp.asarray(img, jnp.float32), n_corners=32)
    pts = np.asarray(pts)
    # corners land within a few px of the 16-px grid crossings (both axes)
    def near(v):
        m = v % 16
        return np.minimum(m, 16 - m) <= 3
    on_grid = near(pts[:, 0]) & near(pts[:, 1])
    assert on_grid.mean() > 0.8


def test_ransac_recovers_known_homography(rng):
    n = 64
    pts1 = rng.uniform(20, 200, (n, 2)).astype(np.float32)
    H_true = np.array([[1.02, 0.03, 5.0], [-0.02, 0.99, -3.0], [1e-5, -1e-5, 1.0]],
                      np.float32)
    pts2 = np.array(_project(jnp.asarray(H_true), jnp.asarray(pts1)))
    pts2 = pts2 + rng.normal(0, 0.3, pts2.shape).astype(np.float32)
    # poison 20% with gross outliers
    k = n // 5
    pts2[:k] += rng.uniform(40, 80, (k, 2))
    w = np.ones(n, np.float32)
    Hm, inl = ransac_homography(jnp.asarray(pts1), jnp.asarray(pts2),
                                jnp.asarray(w), jax.random.PRNGKey(0))
    proj = np.asarray(_project(Hm, jnp.asarray(pts1)))
    err = np.linalg.norm(proj[k:] - pts2[k:], axis=1)
    assert np.median(err) < 1.5
    assert int(np.asarray(inl).sum()) >= 0.6 * (n - k)


def test_dp_seam_follows_low_energy_column():
    energy = np.ones((40, 30), np.float32)
    energy[:, 17] = 0.0
    seam = np.asarray(dp_seam(jnp.asarray(energy)))
    assert (seam == 17).mean() > 0.9


def test_stitch_recovers_synthetic_split(rng):
    """Reference test_stich.py strategy: split one image into overlapping
    strips, distort the second, stitch, and compare the mosaic against the
    original in the img1 frame."""
    base = _texture(rng, 160, 280)
    left = base[:, :170]
    right_src = base[:, 120:]
    # small affine distortion of the right strip (ref: 3 deg rot, 1.02 scale)
    ang = np.radians(2.0)
    c, s = np.cos(ang), np.sin(ang)
    A = np.array([[c, -s, 4.0], [s, c, -2.0], [0, 0, 1.0]], np.float32)
    ys, xs = np.meshgrid(np.arange(160), np.arange(160), indexing="ij")
    src_y = A[0, 0] * ys + A[0, 1] * xs + A[0, 2]
    src_x = A[1, 0] * ys + A[1, 1] * xs + A[1, 2]
    from pcmi_tpu.ops.warp import map_coordinates
    right = np.asarray(map_coordinates(jnp.asarray(right_src),
                                       jnp.asarray(src_y), jnp.asarray(src_x)))

    st = ImageStitcher(n_corners=128, search=16)
    res = st.stitch(jnp.asarray(left), jnp.asarray(right))
    assert int(res.n_inliers) > 20
    mosaic = np.asarray(res.mosaic)
    y0, x0 = res.canvas_offset
    # img1 occupies rows -y0.., cols -x0.. of the canvas; compare its region
    region = mosaic[-y0:-y0 + 160, -x0:-x0 + 170]
    m = np.isfinite(region)
    err = np.abs(region[m] - left[m])
    assert np.median(err) < 0.05
    # mosaic extends beyond img1 (the right strip added content)
    assert mosaic.shape[1] > 170 + x0 * -1 - 5


def test_rgb_to_lab_known_values():
    lab = np.asarray(rgb_to_lab(jnp.asarray([[[1.0, 1.0, 1.0]],
                                             [[0.0, 0.0, 0.0]]])))
    np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(lab[1, 0], [0.0, 0.0, 0.0], atol=0.1)


def test_slic_segments_are_compact_and_cover(rng):
    img = _texture(rng, 96, 96)
    res = slic(jnp.asarray(img), n_segments=64, iters=6)
    labels = np.asarray(res.labels)
    assert labels.min() >= 0 and labels.max() < 64
    assert len(np.unique(labels)) > 32
    # compactness: average segment bbox should be near the grid scale
    sizes = np.bincount(labels.reshape(-1), minlength=64)
    assert sizes[sizes > 0].mean() > 40


def test_obia_classes_separate_regions(rng):
    # two-texture image: smooth left half, noisy right half
    img = np.zeros((96, 96), np.float32)
    img[:, :48] = 0.3
    img[:, 48:] = rng.uniform(0, 1, (96, 48))
    res = OBIAClassifier(n_segments=64, k=2).run_obia_pipeline(jnp.asarray(img))
    classes = np.asarray(res.classes)
    left_mode = np.bincount(classes[:, :40].reshape(-1)).argmax()
    right_mode = np.bincount(classes[:, 56:].reshape(-1)).argmax()
    assert left_mode != right_mode
    # each half should be dominated by its mode (the noisy half fragments
    # more — superpixel means wobble — so its bar is lower)
    assert (classes[:, :40] == left_mode).mean() > 0.8
    assert (classes[:, 56:] == right_mode).mean() > 0.65


def test_slice_offsets_cover_and_overlap():
    grid = slice_offsets((1000, 1400), tile=640, overlap=0.2)
    offs = grid.offsets
    assert offs[:, 0].max() + 640 == 1000
    assert offs[:, 1].max() + 640 == 1400
    assert (offs >= 0).all()
    batch = extract_slices(jnp.zeros((1000, 1400)), jnp.asarray(offs), 640)
    assert batch.shape == (len(offs), 640, 640)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, iou_thresh=0.5, max_out=3))
    kept = set(keep[keep >= 0].tolist())
    assert 0 in kept and 2 in kept and 1 not in kept


def test_detector_finds_planted_blobs(rng):
    img = rng.uniform(0, 0.05, (256, 256)).astype(np.float32)
    img[60:76, 60:76] = 1.0
    img[180:200, 150:170] = 1.0
    det = ObjectDetector(tile=256, score_thresh=0.05).detect(img)
    assert len(det.boxes) >= 2
    centers = det.boxes[:, :2] + (det.boxes[:, 2:] - det.boxes[:, :2]) / 2
    d1 = np.abs(centers - [68, 68]).sum(1).min()
    d2 = np.abs(centers - [190, 160]).sum(1).min()
    assert d1 < 12 and d2 < 12
    coco = ObjectDetector.to_coco(det)
    assert coco and {"image_id", "category_id", "bbox", "score"} <= set(coco[0])


def test_spatial_consistency_filter_kills_lattice_outliers(rng):
    """GMS-style prefilter (ref image_stitching/core.py:62-117): structured
    outliers one texture-period off pass the NCC score but have no local
    motion support; coherent matches survive."""
    from pcmi_tpu.pipelines.stitching import spatial_consistency_filter

    n = 240
    p1 = jnp.asarray(rng.uniform(0, 420, (n, 2)).astype(np.float32))
    true_v = jnp.asarray([7.0, -12.0])
    p2 = p1 + true_v
    # 30% outliers: aliased by one 40-px texture period, per-point random
    # axis and sign (each corner locks onto its own wrong lattice cell)
    out = rng.uniform(size=n) < 0.3
    axis = rng.integers(0, 2, size=n)
    sign = rng.choice([-1.0, 1.0], size=n)
    shift = np.zeros((n, 2), np.float32)
    shift[np.arange(n), axis] = 40.0 * sign
    shift[~out] = 0.0
    p2 = p2 + jnp.asarray(shift)
    wts = jnp.ones((n,))
    w2 = spatial_consistency_filter(p1, p2, wts)
    kept = np.asarray(w2) > 0
    # all coherent matches kept, (almost) all aliased ones dropped
    assert kept[~out].mean() > 0.95
    assert kept[out].mean() < 0.1


def test_stitch_on_repetitive_texture(rng):
    """Periodic texture: NCC score alone locks onto period-aliased matches;
    the spatial-consistency prefilter recovers the true translation."""
    from pcmi_tpu.pipelines.stitching import (
        harris_corners, ncc_match, phase_correlation, ransac_homography,
        spatial_consistency_filter)

    h, w, period = 180, 300, 24
    ys, xs = np.meshgrid(np.arange(h), np.arange(w + 60), indexing="ij")
    base = (0.5 + 0.25 * np.sin(2 * np.pi * xs / period)
            + 0.25 * np.sin(2 * np.pi * ys / period)).astype(np.float32)
    base += 0.1 * _texture(rng, h, w + 60)           # aperiodic cue
    true_dx = 20                                      # NOT a period multiple
    # independent per-image sensor noise drowns the weak aperiodic cue for
    # a fraction of corners — THOSE alias onto wrong lattice cells
    img1 = jnp.asarray(base[:, :w]
                       + 0.03 * rng.normal(size=(h, w)).astype(np.float32))
    img2 = jnp.asarray(base[:, true_dx:true_dx + w]
                       + 0.03 * rng.normal(size=(h, w)).astype(np.float32))

    pts1, _ = harris_corners(img1, 192)
    # zero prior + wide search: the window spans several lattice periods,
    # so corners alias onto diverse wrong cells (the repetitive-texture
    # failure mode a score threshold cannot catch)
    zero = jnp.zeros(())
    pts2, score = ncc_match(img1, img2, pts1, zero, zero,
                            patch=11, search=56)
    wts = jnp.where(score > 0.5, score, 0.0)
    w_f = spatial_consistency_filter(pts1.astype(jnp.float32),
                                     pts2.astype(jnp.float32), wts)

    v = np.asarray(pts2 - pts1, np.float32)
    correct = np.abs(v[:, 1] - (-true_dx)) <= 2.0
    live0 = np.asarray(wts) > 0
    live1 = np.asarray(w_f) > 0
    rate0 = correct[live0].mean() if live0.any() else 0.0
    rate1 = correct[live1].mean() if live1.any() else 0.0
    # the filter must materially raise the share of true-offset matches
    assert live1.sum() >= 30
    assert rate1 > rate0 + 0.15, (rate0, rate1)
    assert rate1 > 0.9

    Hm, inl = ransac_homography(pts1.astype(jnp.float32),
                                pts2.astype(jnp.float32), w_f,
                                jax.random.PRNGKey(0), thresh=3.0)
    # recovered homography is (close to) the pure x-translation
    Hn = np.asarray(Hm) / np.asarray(Hm)[2, 2]
    assert abs(Hn[0, 2] - (-true_dx)) < 2.0 or abs(Hn[1, 2] - (-true_dx)) < 2.0
