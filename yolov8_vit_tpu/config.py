"""Typed configuration tree.

The reference scatters config across three mechanisms (static class `CFG` at
`/root/reference/utils/class_config.py:12-24`, mutable JSON service config
read/written at `/root/reference/app.py:84-98,145-164`, and CLI flags on the
engine build tools).  Here the same knobs live in frozen dataclasses, plus a
small JSON-backed mutable service config for API parity.
"""
from __future__ import annotations

import dataclasses
import json
import os
import threading
from typing import Sequence

# Class set of the reference task ('loss' is an alias of 'lose'):
# /root/reference/utils/class_config.py:91-98
CLASS_NAMES: tuple[str, ...] = ("good", "broke", "lose", "uncovered", "circle")
LABEL_MAPPING: dict[str, int] = {
    "good": 0,
    "broke": 1,
    "lose": 2,
    "loss": 2,
    "uncovered": 3,
    "circle": 4,
}


@dataclasses.dataclass(frozen=True)
class CFG:
    """Classifier training/eval hyper-parameters.

    Field-for-field parity with the reference `CFG`
    (`/root/reference/utils/class_config.py:12-24`), minus torch.device.
    """

    seed: int = 42
    img_size: tuple[int, int] = (224, 224)
    train_bs: int = 1
    num_classes: int = 5
    epoch: int = 10
    lr: float = 1e-4
    model_name: str = "vit_base_patch8_224.augreg_in21k"
    pretrained: str = "weights/vit_best"          # framework checkpoint dir
    train_path: Sequence[str] = ("train/new_train", "train/circle",
                                 "train/2024/train_xmls", "train/new")
    valid_path: Sequence[str] = ("train/2024/valid_xmls", "train/new_valid")
    # optimizer (reference: SGD momentum .9, wd 1e-3,
    # /root/reference/utils/trainClass.py:442-443)
    momentum: float = 0.9
    weight_decay: float = 1e-3

    @property
    def valid_bs(self) -> int:
        # reference: valid_bs = train_bs * 2 (/root/reference/utils/class_config.py:17)
        return self.train_bs * 2


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    """Detection-stage parameters.

    Values pin the reference engine-build + post-processing protocol:
      - in-engine EfficientNMS: IoU .65 / conf .25 / topk 100
        (`/root/reference/test.ipynb` cell 0, `/root/reference/tech.md:41-47`)
      - second-stage confidence filter theta_c = .35 and custom area-sorted
        NMS IoU .45 (`/root/reference/README.md:41-84`,
        `/root/reference/YOLOTensorRT_yolodet_py_解读.md:94`)
      - box inflation before crop (`/root/reference/utils/trainClass.py:76-91`)
    """

    input_size: tuple[int, int] = (640, 640)      # (H, W)
    variant: str = "s"                            # yolov8 n/s/m/l/x
    num_classes: int = 5
    reg_max: int = 16
    strides: tuple[int, ...] = (8, 16, 32)
    # EfficientNMS-equivalent (stage-1, in-graph)
    nms_iou: float = 0.65
    nms_conf: float = 0.25
    nms_topk: int = 100
    # candidate pool for the retired masked greedy pass — UNUSED since the
    # 'masked' impl was removed from decode (round 4); kept so engine
    # meta.json files that recorded it still load
    nms_pre_topk: int = 512
    # "scan": Pallas argmax-selection kernel, full-candidate greedy over all
    #         anchors (exact TRT-plugin semantics, trip count = kept boxes).
    # The only supported value — the legacy "masked" fori_loop impl could
    # diverge under pool truncation and now lives in
    # tests/masked_nms_oracle.py as the cross-check oracle.
    nms_impl: str = "scan"
    # second-stage filter + custom area-sorted NMS
    conf_second: float = 0.35
    custom_nms_iou: float = 0.45
    # crop inflation: code behavior is +/- ((side//10)//2) per side at eval
    # (/root/reference/utils/trainClass.py:85-91); docs say alpha=.1
    # (/root/reference/README.md:88-124).  We implement the code behavior.
    inflate_alpha: float = 0.05
    # letterbox padding value
    pad_value: int = 114


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    The reference has no distributed backend (single `cuda:0`,
    `/root/reference/app.py:25-26`); on TPU we scale via a (data, model)
    mesh with XLA-emitted ICI collectives.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1       # TP degree for the ViT (1 = pure DP)


class ServiceConfig:
    """JSON-backed mutable service config (thread-safe).

    API parity with `/app/train/config.json` (keys `num`, `standard`,
    `class_config`, `detect_config`) read-modify-written by the retrain
    counter and the `/getConfig` route (`/root/reference/app.py:84-98,145-164`).
    Unlike the reference, mutation goes through a lock — the reference
    tolerates a read-modify-write race on this file (SURVEY.md §5).
    """

    DEFAULTS = {
        "num": 0,
        "standard": 100,
        "class_config": {"epoch": 10},
        "detect_config": {},
    }

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump(self.DEFAULTS, f)

    def read(self) -> dict:
        with self._lock, open(self.path) as f:
            return json.load(f)

    def write(self, data: dict) -> None:
        with self._lock, open(self.path, "w") as f:
            json.dump(data, f)

    def update(self, **kv) -> dict:
        with self._lock:
            with open(self.path) as f:
                data = json.load(f)
            data.update(kv)
            with open(self.path, "w") as f:
                json.dump(data, f)
            return data

    def bump_and_check(self) -> tuple[int, bool]:
        """Increment the label counter; return (new_num, retrain_due).

        Mirrors the counter logic in `sycRetrain`
        (`/root/reference/app.py:84-98`): when num reaches `standard` the
        retrain fires and the counter resets to 0.
        """
        with self._lock:
            with open(self.path) as f:
                data = json.load(f)
            num = data.get("num", 0) + 1
            due = num >= data.get("standard", self.DEFAULTS["standard"])
            data["num"] = 0 if due else num
            with open(self.path, "w") as f:
                json.dump(data, f)
            return data["num"], due
