"""Reference `utils/trainClass.py` entry surface
(`/root/reference/utils/trainClass.py`), backed by the TPU stack.

Name-for-name: `set_seed`, `cosine_anneal_schedule`, `crop_image`,
`build_model` (trainClass arg order: pretrained before modelName),
`build_loss`, `train(CFG, log)`, `classExport`, `buildInferModel`,
`deliver`, `retrain(log)`.  Loss classes become the functional
equivalents in `train/losses.py` (torch-golden-tested).
"""
from __future__ import annotations

import numpy as np

from yolov8_vit_tpu.config import CFG as _CFG
from yolov8_vit_tpu.train.classify import (set_seed, train, retrain,  # noqa: F401
                                           build_infer_model)
from yolov8_vit_tpu.train.classify import class_export as _class_export
from yolov8_vit_tpu.train.schedule import cosine_anneal_schedule  # noqa: F401
from yolov8_vit_tpu.train.losses import (combined_loss as build_loss,  # noqa: F401
                                         focal_loss, label_smoothing_ce)  # noqa: F401
from yolov8_vit_tpu.train.dataset import crop_record
from yolov8_vit_tpu.data.voc import deliver  # noqa: F401
from yolov8_vit_tpu.refapi import Network_Wrapper  # noqa: F401


def crop_image(image_path: str, x_min, y_min, x_max, y_max,
               training: bool = False, rng=None) -> np.ndarray:
    """Open + inflate + crop (`/root/reference/utils/trainClass.py:70-93`):
    random inflation up to w/10 per side at train, fixed (w/10)//2 at eval
    — the CODE behavior, not the README's symmetric α=0.1 (SURVEY §7)."""
    row = {"path": image_path,
           "objects": {"xmin": x_min, "ymin": y_min,
                       "xmax": x_max, "ymax": y_max}}
    return crop_record(row, training, rng or np.random.default_rng())


def build_model(CFG, pretrained: str | None = None,
                modelName: str | None = None, spec=None):
    """trainClass's build_model(CFG, pretrained=None, modelName=None)
    (`/root/reference/utils/trainClass.py:341-360`) — note the argument
    order differs from utils.build_model.  Returns (model, params)."""
    from yolov8_vit_tpu import refapi
    return refapi.build_model(CFG, modelName or CFG.model_name,
                              pretrained, spec=spec)


def classExport(CFG=_CFG(), pretrained: str | None = None,
                modelName: str | None = None,
                out_dir: str = "weights/class_engine", spec=None) -> str:
    """`classExport` (`/root/reference/utils/trainClass.py:520-544`):
    load the fine-tuned wrapper weights and export the inference engine
    (an engine directory here instead of ONNX)."""
    _model, params = build_model(CFG, pretrained, modelName, spec=spec)
    if spec is None and modelName is not None:
        # the engine meta must describe the architecture the params came
        # from: _class_export falls back to CFG.model_name when spec is
        # None, which for a modelName override would write a meta.json
        # that reconstructs the WRONG model at Engine load
        from yolov8_vit_tpu.refapi import spec_from_timm_name
        spec = spec_from_timm_name(modelName)
    return _class_export(params, CFG, out_dir, spec=spec)


def buildInferModel(path: str = "weights/class_engine"):
    """`buildInferModel` (`/root/reference/utils/trainClass.py:546-556`):
    engine loader returning None (with a printed error) on failure."""
    return build_infer_model(path)
