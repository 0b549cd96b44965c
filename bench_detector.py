"""Detector benchmark: train the OBB center-heatmap detector and report mAP50.

Prints ONE JSON line:
  {"metric": "detector_obb_map50", "value": <mAP50>, ...}

The reference's comparable number is the YOLO-OBB planes model's claimed
92.8% mAP (``members/jasraj/object_annotation/test_obj.py:53``; trained
100 epochs on a T4 in "1-2 hours", ``obj_model.py:39-52``). Here the
detector trains on synthetic aircraft-like oriented targets with exact
ground truth (egress-free), evaluates with exact rotated-IoU matching on a
held-out set, and must clear the same-quality gate ``mAP50 >= 0.9``.

Run: python bench_detector.py [--steps N]   (a few minutes on one chip)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(steps: int = 1500, batch: int = 16, size: int = 128,
         eval_scenes: int = 64, seed: int = 0, hard: bool = True):
    import jax
    import jax.numpy as jnp

    from pcmi_tpu.models.detector import (
        DetectorTrainConfig,
        OBBDetectorTrainer,
        synthesize_obb_batch,
    )
    from pcmi_tpu.models.detector_eval import map50

    trainer = OBBDetectorTrainer(DetectorTrainConfig(lr=1e-3))
    key = jax.random.PRNGKey(seed)
    images, obbs, valid = synthesize_obb_batch(key, batch, size, hard=hard)
    params, opt = trainer.init(jax.random.PRNGKey(seed + 1), images)

    t0 = time.perf_counter()
    loss = float("nan")
    for step in range(steps):
        key, sub = jax.random.split(key)
        images, obbs, valid = synthesize_obb_batch(sub, batch, size, hard=hard)
        params, opt, metrics = trainer.train_step(params, opt, images, obbs, valid)
        if step % 200 == 0 or step == steps - 1:
            loss = float(metrics["loss"])
    train_s = time.perf_counter() - t0

    detect = trainer.make_obb_detector(params, max_boxes=8, score_thresh=0.25)
    eval_key = jax.random.PRNGKey(10_000 + seed)   # held-out stream
    dets, gts = [], []
    per_batch = 8
    for _ in range(eval_scenes // per_batch):
        eval_key, sub = jax.random.split(eval_key)
        images, obbs, valid = synthesize_obb_batch(sub, per_batch, size,
                                                   hard=hard)
        out = np.asarray(detect(images))
        for i in range(per_batch):
            d = out[i]
            dets.append(d[d[:, 5] > 0.25])
            g = np.asarray(obbs[i])[np.asarray(valid[i])]
            gts.append(g)

    ap, stats = map50(dets, gts)
    # PR curve samples (precision at fixed recalls) for the report
    pr = stats.pop("pr_curve", None)
    result = {
        "metric": "detector_obb_map50",
        "value": round(ap, 4),
        "unit": "mAP@0.5(rotated IoU)",
        "vs_baseline": round(ap / 0.928, 3),   # reference YOLO-OBB claim
        "detail": {
            "steps": steps, "batch": batch, "train_seconds": round(train_s, 1),
            "final_loss": round(loss, 4), "eval_scenes": eval_scenes,
            "hard_scenes": bool(hard),
            **stats,
            "pr_curve": pr,
            "gates": {"map50_ge_0.9": bool(ap >= 0.9)},
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--steps", type=int, default=1500)
    ap_.add_argument("--batch", type=int, default=16)
    ap_.add_argument("--easy", action="store_true",
                     help="the original distractor-free scenes")
    args = ap_.parse_args()
    main(steps=args.steps, batch=args.batch, hard=not args.easy)
