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
    for i in range(250):
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
