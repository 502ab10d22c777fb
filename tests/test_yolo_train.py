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
