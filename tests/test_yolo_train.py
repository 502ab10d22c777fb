"""YOLO training pipeline: dataset loading, train entry, retrain flow."""
import dataclasses
import os
import random

import numpy as np
import pytest
from PIL import Image

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.data.voc import generate_annotation, xml2txt
from yolov8_vit_tpu.train.yolo_train import YoloDataset, train, yolo_retrain

TINY_CFG = DetectConfig(input_size=(64, 64), variant="n", num_classes=5,
                        nms_pre_topk=64, nms_topk=16)


def _make_voc_dir(d, n=8):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = np.full((60, 80, 3), 90, np.uint8)
        x1, y1 = int(rng.integers(5, 30)), int(rng.integers(5, 20))
        arr[y1:y1 + 25, x1:x1 + 30] = (230, 60, 60)
        name = f"img{i}.jpg"
        Image.fromarray(arr).save(os.path.join(d, name))
        generate_annotation("", name, name,
                            [{"sort": "good", "xmin": x1, "ymin": y1,
                              "xmax": x1 + 30, "ymax": y1 + 25}],
                            save_dir=d, image_size=(80, 60))


@pytest.fixture
def fold(tmp_path):
    src = str(tmp_path / "new")
    _make_voc_dir(src, 8)
    dst = str(tmp_path / "fold0")
    # 50/50 split so both splits are guaranteed non-empty with this seed
    n = xml2txt(src, dst, val_fraction=0.5, rng=random.Random(0))
    assert n == 8
    return dst


def test_yolo_dataset_batches(fold):
    ds = YoloDataset(fold, "train", img_size=64, max_gt=8)
    assert len(ds) > 0
    imgs, boxes, labels, mask = next(ds.batches(2))
    assert imgs.shape == (2, 64, 64, 3)
    assert boxes.shape == (2, 8, 4) and mask.shape == (2, 8)
    assert mask[:, 0].all() and not mask[:, 1].any()
    # boxes letterboxed into 64x64 space
    assert (boxes[mask] >= 0).all() and (boxes[mask] <= 64).all()
    assert imgs.min() >= 0 and imgs.max() <= 1.0


def test_yolo_train_one_epoch_runs(fold):
    params, metrics = train(
        epochs=1, batch=2, data_root=fold, cfg=TINY_CFG, lr0=1e-3,
        max_gt=8, log_fn=lambda *a: None)
    assert "final" in metrics
    assert 0.0 <= metrics["final"]["map50"] <= 1.0


def test_yolo_retrain_flow(tmp_path):
    _make_voc_dir(str(tmp_path / "train/new"), 6)
    metrics = yolo_retrain(str(tmp_path), TINY_CFG, epochs=1, batch=2,
                           log_fn=lambda *a: None)
    # engine exported and loadable
    from yolov8_vit_tpu.runtime.engine import Engine
    eng = Engine(str(tmp_path / "weights/detect_engine"))
    assert eng.kind == "detect"
    out = eng(np.zeros((1, 3, 64, 64), np.float32))
    assert out[1].shape == (1, 16, 4)


def test_mosaic_batches(fold):
    ds = YoloDataset(fold, "train", img_size=64, max_gt=8)
    if len(ds) < 4:
        pytest.skip("needs >=4 train items")
    imgs, boxes, labels, mask = next(ds.batches(2, augment=True, seed=0,
                                                mosaic=1.0))
    assert imgs.shape == (2, 64, 64, 3)
    # mosaics should usually carry multiple gt boxes
    assert mask.sum() >= 2
    valid = boxes[mask]
    assert (valid >= 0).all() and (valid <= 64).all()
    assert ((valid[:, 2] - valid[:, 0]) > 0).all()


# ---------------------------------------------------------------------------
# train-recipe parity (ultralytics model.train knobs the reference delegates
# to, /root/reference/utils/trainYolo.py:33): HSV jitter, random affine,
# warmup + lr decay, multi-scale
# ---------------------------------------------------------------------------

def test_hsv_jitter_invariants():
    from yolov8_vit_tpu.train.yolo_train import augment_hsv
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    # identity at zero gains
    np.testing.assert_array_equal(augment_hsv(img, rng, 0, 0, 0), img)
    # shape/dtype preserved, values in range, deterministic per seed
    a = augment_hsv(img, np.random.default_rng(7))
    b = augment_hsv(img, np.random.default_rng(7))
    assert a.shape == img.shape and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, img)        # jitter actually applied


def test_random_affine_identity_is_center_crop():
    """scale=0/translate=0/degrees=0 -> deterministic center crop of the
    2S canvas with boxes shifted by -S/2 (ultralytics border=-S/2)."""
    from yolov8_vit_tpu.train.yolo_train import random_affine
    rng = np.random.default_rng(0)
    s = 32
    canvas = np.zeros((2 * s, 2 * s, 3), np.float32)
    canvas[20:44, 24:52] = 0.8
    boxes = np.array([[24, 20, 52, 44]], np.float32)
    labels = np.array([1], np.int32)
    out, b2, l2 = random_affine(canvas, boxes, labels, rng, s,
                                degrees=0, translate=0, scale=0)
    ref = canvas[s // 2:3 * s // 2, s // 2:3 * s // 2]
    np.testing.assert_allclose(out, ref, atol=1 / 255.0 + 1e-6)
    np.testing.assert_allclose(
        b2, np.clip(boxes - s / 2, 0, s), atol=1e-4)
    assert list(l2) == [1]


def test_random_affine_drops_out_of_view_boxes():
    from yolov8_vit_tpu.train.yolo_train import random_affine
    rng = np.random.default_rng(1)
    s = 32
    canvas = np.zeros((2 * s, 2 * s, 3), np.float32)
    boxes = np.array([[0, 0, 6, 6],            # far corner: cropped away
                      [28, 28, 40, 40]], np.float32)  # center: survives
    labels = np.array([0, 1], np.int32)
    out, b2, l2 = random_affine(canvas, boxes, labels, rng, s,
                                degrees=0, translate=0, scale=0)
    assert list(l2) == [1]
    assert len(b2) == 1


def test_lr_schedule_shapes():
    import jax.numpy as jnp
    from yolov8_vit_tpu.train.yolo_train import make_lr_schedule
    lr0 = 1e-2
    # reference parity: lrf=1 -> flat after warmup
    s = make_lr_schedule(lr0, 1.0, total_steps=1000, warmup_steps=100)
    assert float(s(0)) < 0.02 * lr0 + 1e-12
    assert abs(float(s(100)) - lr0) < 1e-9
    assert abs(float(s(900)) - lr0) < 1e-9
    # linear decay to lr0*lrf
    s2 = make_lr_schedule(lr0, 0.01, total_steps=1000, warmup_steps=0)
    assert abs(float(s2(0)) - lr0) < 1e-9
    assert abs(float(s2(1000)) - lr0 * 0.01) < 1e-9
    mid = float(s2(500))
    assert lr0 * 0.4 < mid < lr0 * 0.6
    # cosine: slower start, same endpoints
    s3 = make_lr_schedule(lr0, 0.01, total_steps=1000, warmup_steps=0,
                          cos_lr=True)
    assert abs(float(s3(0)) - lr0) < 1e-9
    assert abs(float(s3(1000)) - lr0 * 0.01) < 1e-9
    assert float(s3(200)) > float(s2(200))


def test_full_recipe_finetune_improves_map(fold):
    """Synthetic fine-tune with the COMPLETE recipe on (hsv + mosaic +
    affine + warmup + cosine + multi-scale): mAP after training >= before
    (the easy one-rectangle dataset must be learnable through the heavier
    augmentation — VERDICT item 8's done-gate)."""
    params, metrics = train(
        epochs=2, batch=2, data_root=fold, cfg=TINY_CFG, lr0=2e-3,
        max_gt=8, log_fn=lambda *a: None, lrf=0.1, cos_lr=True,
        warmup_epochs=0.5, multi_scale=True)
    assert "final" in metrics and "preval" in metrics
    assert metrics["final"]["map50"] >= metrics["preval"]["map50"]


AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(AXON_PLUGIN),
                    reason="tunnel PJRT plugin absent")
def test_yolo_recipe_learns_on_hardware():
    """The training recipe actually IMPROVES mAP (VERDICT round-2 item 7):
    from-scratch yolov8n on a learnable-scale synthetic shapes set reaches
    real mAP50 under the reference's val protocol — ~3,600 augmented steps
    on the chip (dispatch-bound; a CPU run of the same needs ~4 min, so
    this is TPU-gated like the kernel/e2e gates).  The no-augment arm pins
    the memorization ceiling; the aug arm trains through the full
    mosaic/affine/HSV pipeline.  See tests/yolo_learns_helper.py for why
    object scale (not step count) is the learnability condition."""
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)    # let sitecustomize register axon
    run = subprocess.run(
        [sys.executable, os.path.join(repo, "tests",
                                      "yolo_learns_helper.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    line = [ln for ln in run.stdout.splitlines()
            if ln.startswith("YOLO_LEARNS")]
    assert line, f"stdout:\n{run.stdout}\nstderr:\n{run.stderr[-2000:]}"
    kv = dict(p.split("=") for p in line[0].split()[1:])
    preval, aug, noaug = (float(kv[k]) for k in ("preval", "aug", "noaug"))
    assert preval < 0.05
    # full recipe improves mAP50 by a wide margin over the random start
    assert aug >= preval + 0.3, line[0]
    # optimizer+loss can fully fit the data (memorization ceiling)
    assert noaug >= 0.9, line[0]
