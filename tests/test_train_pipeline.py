"""End-to-end classifier training on synthetic data: the dataset layer,
rate-balanced sampling, trainer loop, best-val checkpointing, and the
retrain() orchestration (SURVEY.md §3.3 flow)."""
import dataclasses
import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from yolov8_vit_tpu.config import CFG
from yolov8_vit_tpu.data.voc import generate_annotation
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.train.dataset import (split_by_circle, ClassifierData,
                                          crop_record)

TINY = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
               backbone_classes=40)


def _make_dataset(root, n_per_class=6, classes=("good", "broke", "circle")):
    """Class-colored squares so a tiny net can learn the mapping."""
    colors = {"good": (220, 40, 40), "broke": (40, 220, 40),
              "lose": (220, 220, 40), "uncovered": (40, 40, 220),
              "circle": (40, 220, 220)}
    os.makedirs(root, exist_ok=True)
    k = 0
    for cls in classes:
        for i in range(n_per_class):
            arr = np.full((80, 100, 3), 110, np.uint8)
            arr[20:60, 30:80] = colors[cls]
            name = f"{cls}_{i}.jpg"
            Image.fromarray(arr).save(os.path.join(root, name))
            generate_annotation("", name, name,
                                [{"sort": cls, "xmin": 30, "ymin": 20,
                                  "xmax": 80, "ymax": 60}],
                                save_dir=root, image_size=(100, 80))
            k += 1
    return k


def _cfg(tmp_path, **kw):
    return dataclasses.replace(
        CFG(train_bs=4, epoch=2, lr=3e-3,
            train_path=[str(tmp_path / "train_xml")],
            valid_path=[str(tmp_path / "valid_xml")],
            img_size=(32, 32)), **kw)


def test_split_by_circle(tmp_path):
    d = str(tmp_path / "train_xml")
    _make_dataset(d)
    obj, cir = split_by_circle([d], random.Random(0))
    assert len(obj) == 12 and len(cir) == 6
    assert all(o["objects"]["label"] == 4 for o in cir)


def test_split_by_circle_drops_unknown_labels(tmp_path, capsys):
    """Objects with unmapped class names (parse_voc_xml label -1) must be
    filtered (regression: -1 one-hot encoded as the LAST class via numpy
    negative indexing and silently mistrained)."""
    d = str(tmp_path / "train_xml")
    _make_dataset(d)
    arr = np.full((80, 100, 3), 110, np.uint8)
    Image.fromarray(arr).save(os.path.join(d, "weird.jpg"))
    generate_annotation("", "weird.jpg", "weird.jpg",
                        [{"sort": "Bogus", "xmin": 1, "ymin": 1,
                          "xmax": 40, "ymax": 40}],
                        save_dir=d, image_size=(100, 80))
    obj, cir = split_by_circle([d], random.Random(0))
    assert len(obj) == 12 and len(cir) == 6      # the Bogus object is gone
    assert all(0 <= o["objects"]["label"] <= 4 for o in obj + cir)
    assert "skipped 1" in capsys.readouterr().out


def test_crop_record_train_vs_eval(tmp_path):
    d = str(tmp_path / "train_xml")
    _make_dataset(d, n_per_class=1, classes=("good",))
    obj, _ = split_by_circle([d], random.Random(0))
    rng = np.random.default_rng(0)
    ev = crop_record(obj[0], False, rng)
    # eval inflation: box (30,20,80,60) w=50 h=40 -> dis 5//? (50//10)//2=2, (40//10)//2=2
    assert ev.shape == (44, 54, 3)
    tr = crop_record(obj[0], True, rng)
    assert tr.shape[0] >= 40 and tr.shape[1] >= 50


def test_rate_balanced_batches(tmp_path):
    d = str(tmp_path / "train_xml")
    _make_dataset(d)
    cfg = _cfg(tmp_path)
    obj, cir = split_by_circle([d], random.Random(0))
    data = ClassifierData(cfg, obj, cir, training=True, workers=2)
    assert data.rate == pytest.approx(6 / 18)
    imgs, onehot = next(iter(data.batches(8, epoch=0)))
    assert imgs.shape == (8, 32, 32, 3) and onehot.shape == (8, 5)
    assert imgs.dtype == np.float32
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0


def test_training_learns_synthetic_classes(tmp_path):
    """2 epochs of the tiny ViT must beat chance on color-coded classes and
    exercise the full fit loop incl. metric log + checkpoint export."""
    _make_dataset(str(tmp_path / "train_xml"), n_per_class=8)
    _make_dataset(str(tmp_path / "valid_xml"), n_per_class=3)
    cfg = _cfg(tmp_path)

    from yolov8_vit_tpu.train import classify
    params, best = classify.train(
        cfg, log=True, workdir=str(tmp_path),
        init_params=None, log_fn=lambda *a: None)
    # best-val checkpoint engine exported
    assert os.path.isdir(tmp_path / "weights/new_weight/best")
    # metric log written with reference-shaped rows
    rows = json.load(open(tmp_path / "train/result.json"))
    assert set(rows) == {"1", "2"}
    assert "val_acc" in rows["1"]
    # learned something: 3 classes present, chance ~33%
    assert best > 40.0


# speed: patch the spec used by classify.train to the tiny one
@pytest.fixture(autouse=True)
def _tiny_spec(monkeypatch):
    from yolov8_vit_tpu.train import classify
    monkeypatch.setattr(classify, "_spec_for", lambda cfg: TINY)
