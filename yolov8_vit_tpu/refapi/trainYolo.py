"""Reference `utils/trainYolo.py` entry surface
(`/root/reference/utils/trainYolo.py`), backed by the native
ultralytics-free YOLO training stack."""
from __future__ import annotations

from yolov8_vit_tpu.data.voc import yolo2dict  # noqa: F401
from yolov8_vit_tpu.train.yolo_train import train as _train
from yolov8_vit_tpu.train.yolo_train import yolo_retrain


def train(epochs: int, batch: int, data, **kw):
    """`train(epochs, batch, data)` (`/root/reference/utils/trainYolo.py:6-38`):
    val-before-train mAP check, then fine-tune at lr0=lrf=1e-4.  `data` is
    the dataset root (the reference passes a data.yaml path; a directory
    containing fold0/ works here)."""
    return _train(epochs, batch, data, **kw)


def yoloRetrain(workdir: str = ".", **kw):
    """`yoloRetrain()` (`/root/reference/utils/trainYolo.py:124-137`):
    convert train/new XMLs to YOLO layout, fine-tune, export the engine."""
    return yolo_retrain(workdir=workdir, **kw)
