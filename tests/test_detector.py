"""Trainable detector: losses, overfit on synthetic blobs, e2e with slicing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcmi_tpu.models.detector import (
    CenterNetHead,
    DetectorTrainConfig,
    DetectorTrainer,
    focal_loss,
    gaussian_heatmap,
    synthesize_detection_batch,
)
from pcmi_tpu.pipelines.detection import ObjectDetector


def test_gaussian_heatmap_and_focal():
    centers = jnp.asarray([[8.0, 8.0], [20.0, 25.0]])
    valid = jnp.asarray([True, False])
    heat = gaussian_heatmap(centers, valid, (32, 32), jnp.asarray([2.0, 2.0]))
    assert abs(float(heat[8, 8]) - 1.0) < 1e-5
    assert float(heat[20, 25]) < 1e-3  # masked center contributes nothing
    # focal loss: perfect logits -> tiny loss
    logits = jnp.where(heat >= 0.999, 10.0, -10.0)
    assert float(focal_loss(logits, heat)) < 0.01


def test_synthesize_batch_shapes():
    imgs, boxes, valid = synthesize_detection_batch(jax.random.PRNGKey(0),
                                                    batch=4, size=96)
    assert imgs.shape == (4, 96, 96, 1)
    assert boxes.shape == (4, 6, 4) and valid.shape == (4, 6)
    assert bool(valid.any())


@pytest.mark.slow
def test_detector_trains_and_detects():
    trainer = DetectorTrainer(
        DetectorTrainConfig(lr=2e-3),
        model=CenterNetHead(widths=(8, 16, 32)),
    )
    imgs, boxes, valid = synthesize_detection_batch(jax.random.PRNGKey(0),
                                                    batch=8, size=128)
    params, opt = trainer.init(jax.random.PRNGKey(1), imgs)
    losses = []
    for i in range(150):
        if i % 10 == 0:
            imgs, boxes, valid = synthesize_detection_batch(
                jax.random.PRNGKey(i), batch=8, size=128)
        params, opt, m = trainer.train_step(params, opt, imgs, boxes, valid)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])

    # e2e: the trained tile detector inside the sliced-inference driver
    det_fn = trainer.make_tile_detector(params, score_thresh=0.2)
    driver = ObjectDetector(detector=det_fn, tile=128, score_thresh=0.2)
    timgs, tboxes, tvalid = synthesize_detection_batch(jax.random.PRNGKey(99),
                                                       batch=1, size=128)
    scene = np.asarray(timgs[0, :, :, 0])
    det = driver.detect(scene)
    gt = np.asarray(tboxes[0])[np.asarray(tvalid[0])]
    assert len(det.boxes) >= 1
    gt_centers = (gt[:, :2] + gt[:, 2:]) / 2
    got_centers = (det.boxes[:, :2] + det.boxes[:, 2:]) / 2
    # most GT blobs have a detection near their center (smoke-level
    # training budget; the full config trains far longer)
    d = np.abs(gt_centers[:, None] - got_centers[None]).sum(-1).min(1)
    assert (d < 12).mean() >= 0.65


def test_rotated_iou_known_values():
    from pcmi_tpu.models.detector_eval import rotated_iou

    a = np.array([10.0, 10.0, 4.0, 8.0, 0.0])
    assert abs(rotated_iou(a, a) - 1.0) < 1e-6
    # same box rotated by pi is identical (rectangle symmetry)
    b = a.copy(); b[4] = np.pi
    assert abs(rotated_iou(a, b) - 1.0) < 1e-5
    # half-overlapping axis-aligned boxes: inter=16, union=48 -> 1/3
    c = np.array([10.0, 14.0, 4.0, 8.0, 0.0])
    assert abs(rotated_iou(a, c) - 16.0 / 48.0) < 1e-6
    # disjoint
    d = np.array([40.0, 40.0, 4.0, 8.0, 0.3])
    assert rotated_iou(a, d) == 0.0
    # square over itself rotated 45 deg: octagon intersection of area
    # 2s^2(sqrt2-1) -> IoU = (sqrt2-1)/(2-sqrt2) = 1/sqrt2
    sq = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    sq45 = np.array([0.0, 0.0, 2.0, 2.0, np.pi / 4])
    assert abs(rotated_iou(sq, sq45) - 1 / np.sqrt(2)) < 1e-3


def test_map50_perfect_and_miss():
    from pcmi_tpu.models.detector_eval import map50

    gt = [np.array([[10.0, 10.0, 6.0, 12.0, 0.3]])]
    hit = [np.array([[10.0, 10.0, 6.0, 12.0, 0.3, 0.9]])]
    ap, stats = map50(hit, gt)
    assert ap == 1.0 and stats["n_gt"] == 1
    miss = [np.array([[40.0, 40.0, 6.0, 12.0, 0.3, 0.9]])]
    ap2, _ = map50(miss, gt)
    assert ap2 == 0.0


def test_obb_detector_short_training_map():
    """Short-budget OBB training reaches usable mAP50 on held-out scenes
    (bench_detector.py runs the full budget; ref claim 92.8%,
    ``test_obj.py:53``)."""
    from pcmi_tpu.models.detector import OBBDetectorTrainer, synthesize_obb_batch
    from pcmi_tpu.models.detector_eval import map50

    trainer = OBBDetectorTrainer()
    key = jax.random.PRNGKey(0)
    imgs, obbs, valid = synthesize_obb_batch(key, batch=8, size=96)
    params, opt = trainer.init(jax.random.PRNGKey(1), imgs)
    # plumbing gate (bench_detector.py carries the mAP claim at full
    # budget): 65 steps is the measured minimum that clears 0.5 with margin
    # (50 steps measured under it, r5)
    for i in range(65):
        key, sub = jax.random.split(key)
        imgs, obbs, valid = synthesize_obb_batch(sub, batch=8, size=96)
        params, opt, m = trainer.train_step(params, opt, imgs, obbs, valid)
    detect = trainer.make_obb_detector(params, max_boxes=6, score_thresh=0.25)
    dets, gts = [], []
    ek = jax.random.PRNGKey(777)
    for _ in range(2):
        ek, sub = jax.random.split(ek)
        imgs, obbs, valid = synthesize_obb_batch(sub, batch=8, size=96)
        out = np.asarray(detect(imgs))
        for i in range(8):
            d = out[i]
            dets.append(d[d[:, 5] > 0.25])
            gts.append(np.asarray(obbs[i])[np.asarray(valid[i])])
    ap, _ = map50(dets, gts)
    assert ap > 0.5, f"short-budget OBB mAP50 {ap:.3f}"
