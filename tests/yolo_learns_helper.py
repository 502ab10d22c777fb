"""Subprocess helper: prove the native YOLO training recipe LEARNS.

Runs on the real TPU (steps are dispatch-bound ~5-8 ms there, so thousands
of steps fit a CI minute; the same run needs ~4 CPU-minutes).  Trains
yolov8n from scratch on a synthetic 3-class shapes set at learnable object
scale and reports mAP50 under the reference's validation protocol
(conf .25 — `/root/reference/utils/trainYolo.py:21-26`):

  * aug arm: the full train-time recipe (mosaic + affine + HSV + hflip via
    YoloDataset.batches(augment=True)) for 3,600 steps;
  * no-aug arm: plain letterboxed images for 2,400 steps (memorization
    ceiling — pins that the optimizer+loss can fully fit the data).

Object scale matters: at init the DFL head emits near-frame-sized boxes,
so tiny objects give IoU ~0.02 whose ^6 in the task-aligned metric
underflows the assigner's 1e-9 epsilon — target scores collapse and
training degenerates (measured, docs/performance.md round 3).  That is
faithful ultralytics behavior (same formula, same epsilon), which is why
both ultralytics and this framework fine-tune detectors from pretrained
checkpoints on real data; from-scratch learning needs objects at
anchor-commensurate scale, as here.

Prints one line:  YOLO_LEARNS preval=X aug=Y noaug=Z
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_big_shapes(root, n=48, size=64, seed=0):
    import numpy as np
    import cv2
    rng = np.random.default_rng(seed)
    for split, count in (("train", n), ("val", 12)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        for i in range(count):
            img = np.full((size, size, 3), 40, np.uint8)
            cls = int(rng.integers(0, 3))
            s_ = int(rng.integers(40, 56))
            x = int(rng.integers(0, size - s_))
            y = int(rng.integers(0, size - s_))
            if cls == 0:
                cv2.rectangle(img, (x, y), (x + s_, y + s_),
                              (230, 60, 60), -1)
            elif cls == 1:
                cv2.circle(img, (x + s_ // 2, y + s_ // 2), s_ // 2,
                           (60, 230, 60), -1)
            else:
                pts = np.array([[x + s_ // 2, y], [x, y + s_],
                                [x + s_, y + s_]])
                cv2.fillPoly(img, [pts], (60, 60, 230))
            cx, cy = (x + s_ / 2) / size, (y + s_ / 2) / size
            cv2.imwrite(f"{root}/images/{split}/i{i}.png", img[..., ::-1])
            open(f"{root}/labels/{split}/i{i}.txt", "w").write(
                f"{cls} {cx} {cy} {s_ / size} {s_ / size}")


def run_arm(model, train_ds, val_ds, cfg, augment: bool, total: int):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.train.yolo_train import (make_yolo_train_step,
                                                 make_yolo_optimizer,
                                                 validate)
    batches = []
    for epoch in range(8):
        for tup in train_ds.batches(8, augment=augment, seed=epoch):
            batches.append(tuple(jnp.asarray(a) for a in tup))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    # warmup at the production floor (train() uses max(3 epochs, 100));
    # with the ultralytics-true loss scale (* batch_size) + grad clip,
    # warmup-free SGD diverges exactly as real ultralytics would
    tx = make_yolo_optimizer(1e-2, 1.0, total, len(batches), 100)
    opt = tx.init(params)
    step = make_yolo_train_step(model, tx, (64, 64), cfg.reg_max)
    for i in range(total):
        b = batches[i % len(batches)]
        params, opt, _loss, _parts = step(params, opt, *b)
    return validate(model, params, val_ds, cfg)["map50"]


def main():
    import dataclasses
    import tempfile
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    from yolov8_vit_tpu.train.yolo_train import YoloDataset, validate
    from yolov8_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="yolo_learns_")
    make_big_shapes(root)
    cfg = DetectConfig(input_size=(64, 64), variant="n", num_classes=3,
                       nms_pre_topk=64, nms_topk=16)
    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=3)
    model = YOLOv8(spec, fused=True)
    train_ds = YoloDataset(root, "train", 64, 8)
    val_ds = YoloDataset(root, "val", 64, 8)

    params0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)))
    preval = validate(model, params0, val_ds, cfg)["map50"]
    aug = run_arm(model, train_ds, val_ds, cfg, augment=True, total=3600)
    noaug = run_arm(model, train_ds, val_ds, cfg, augment=False, total=2400)
    print(f"YOLO_LEARNS preval={preval:.3f} aug={aug:.3f} "
          f"noaug={noaug:.3f}")


if __name__ == "__main__":
    main()
