"""Classifier training entry points — `trainClass.py` orchestration parity.

  retrain(log)      seed -> deliver -> train -> export engine
                    (`/root/reference/utils/trainClass.py:600-639`)
  train(cfg, log)   dataset build -> fit loop with best-val checkpointing
                    (`:424-516`)
  class_export      trained params -> classify engine dir (the ONNX-export
                    equivalent, `:520-542`)
  build_infer_model engine dir -> callable classifier (`:546-554`)
"""
from __future__ import annotations

import dataclasses
import os
import random
from typing import Callable

import numpy as np
import jax

from yolov8_vit_tpu.config import CFG
from yolov8_vit_tpu.data.voc import deliver
from yolov8_vit_tpu.models.vit import ViTSpec, VIT_B8_224
from yolov8_vit_tpu.runtime.engine import Engine, save_engine
from yolov8_vit_tpu.train.dataset import build_dataloaders
from yolov8_vit_tpu.train.vit_train import ViTTrainer


def set_seed(seed: int = 42) -> None:
    """Host-side RNG seeding (`/root/reference/utils/trainClass.py:189-193`).
    Device-side randomness uses explicit jax.random keys derived from cfg.seed."""
    random.seed(seed)
    np.random.seed(seed)


def _spec_for(cfg: CFG) -> ViTSpec:
    if "patch16" in cfg.model_name:
        return ViTSpec(patch=16)
    return VIT_B8_224


def class_export(params, cfg: CFG, out_dir: str,
                 spec: ViTSpec | None = None) -> str:
    """Serialize trained classifier params as a classify engine."""
    spec = spec or _spec_for(cfg)
    return save_engine(out_dir, "classify", params,
                       {"vit_spec": dataclasses.asdict(spec),
                        "num_classes": cfg.num_classes,
                        "model_name": cfg.model_name})


def build_infer_model(path: str) -> Engine | None:
    try:
        return Engine(path)
    except (OSError, ValueError) as e:
        print(f"Error loading classify engine from {path}: {e}")
        return None


def train(cfg: CFG = CFG(), log: bool = False, mesh=None,
          workdir: str = ".", init_params=None,
          log_fn: Callable[[str], None] = print):
    """Full fine-tune; returns (params, best_val_acc).

    Loads `cfg.pretrained` engine when it exists (the reference always
    resumes from the prior best, `/root/reference/utils/trainClass.py:357`);
    otherwise random-initializes.
    """
    trainer = ViTTrainer(
        cfg=cfg, spec=_spec_for(cfg), mesh=mesh,
        log_path=os.path.join(workdir, "train/result.json"),
        log_fn=log_fn)
    # trainer.init() is a multi-second jitted model.init compile — only pay
    # it when no weights are supplied (the normal retrain path resumes from
    # the prior best and needs just the optimizer state for its tree)
    pre = os.path.join(workdir, cfg.pretrained)
    if init_params is not None:
        params = init_params
        opt_state = trainer.optimizer.init(params)
    elif os.path.isdir(pre):
        params = Engine(pre).params
        opt_state = trainer.optimizer.init(params)
        log_fn(f"resumed from {pre}")
    else:
        params, opt_state = trainer.init()

    train_data, valid_data = build_dataloaders(
        _with_workdir(cfg, workdir))
    epoch_box = {"n": 0}

    def train_loader():
        epoch_box["n"] += 1
        return train_data.batches(cfg.train_bs, epoch=epoch_box["n"],
                                  drop_last=True)

    def valid_loader():
        return valid_data.batches(cfg.valid_bs)

    best_dir = os.path.join(workdir, "weights/new_weight/best")

    def save_ckpt(p):
        class_export(p, cfg, best_dir)

    params, opt_state, best = trainer.fit(
        params, opt_state, train_loader, valid_loader,
        save_checkpoint=save_ckpt, log=log)
    return params, best


def _with_workdir(cfg: CFG, workdir: str) -> CFG:
    return dataclasses.replace(
        cfg,
        train_path=[os.path.join(workdir, p) for p in cfg.train_path],
        valid_path=[os.path.join(workdir, p) for p in cfg.valid_path])


def retrain(log: bool = False, cfg: CFG = CFG(), mesh=None,
            workdir: str = ".",
            log_fn: Callable[[str], None] = print):
    """Full retrain cycle (`/root/reference/utils/trainClass.py:600-639`)."""
    set_seed(cfg.seed)
    log_fn("Starting data delivery...")
    deliver(os.path.join(workdir, "train/new/"),
            os.path.join(workdir, "train/new_train"),
            os.path.join(workdir, "train/new_valid"))
    if log:
        result = os.path.join(workdir, "train/result.json")
        os.makedirs(os.path.dirname(result), exist_ok=True)
        with open(result, "w") as f:
            f.write("{}")
    log_fn("Starting training...")
    params, best = train(cfg, log=log, mesh=mesh, workdir=workdir,
                         log_fn=log_fn)
    log_fn("Exporting engine...")
    latest = os.path.join(workdir, "weights/new_weight/best")
    out = os.path.join(workdir, "weights/class_engine")
    if os.path.isdir(latest):
        class_export(Engine(latest).params, cfg, out)
    else:
        class_export(params, cfg, out)
    log_fn("Retraining process complete.")
    return best
