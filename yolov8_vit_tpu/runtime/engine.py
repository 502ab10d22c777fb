"""Engine: serialized model artifact + AOT-jitted executable wrapper.

API parity with the reference's `TRTModule` engine runtime
(`/root/reference/app.py:27-29`, `/root/reference/test.py:12-13`):

    Engine = TRTModule(engine_path, device)
    Engine.set_desired(['num_dets', 'bboxes', 'scores', 'labels'])
    outputs = Engine(tensor)          # (1,3,640,640) float blob

A TensorRT `.engine` file becomes an **engine directory**:

    <path>/meta.json        kind, model spec, NMS protocol, input shape
    <path>/params.msgpack   flax-serialized parameter pytree

and `Engine(tensor)` executes the jit-compiled XLA graph (compiled once per
input shape, cached — the XLA analogue of deserializeCudaEngine +
createExecutionContext quoted at
`/root/reference/docs/YOLO_TensorRT_Technical.md:228-230`).

Engine kinds:
  "detect"    YOLOv8 + DFL + EfficientNMS-equiv; input: letterboxed blob
              (NCHW float [0,1] RGB, like the reference blob()) or NHWC;
              outputs num_dets/bboxes/scores/labels in letterboxed coords.
  "classify"  ViT wrapper; input NCHW/NHWC normalized [-1,1]; output logits
              (the reference's class.onnx contract,
              `/root/reference/utils/trainClass.py:520-542`).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.serialization

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
from yolov8_vit_tpu.runtime.detector import decode_predictions

DETECT_OUTPUTS = ("num_dets", "bboxes", "scores", "labels")


def save_engine(path: str, kind: str, params: Any, meta: dict) -> str:
    """Serialize an engine directory (the 'build.py' output equivalent)."""
    os.makedirs(path, exist_ok=True)
    meta = dict(meta, kind=kind)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    return path


def _maybe_nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    # reference blob() emits NCHW; NHWC passes through
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


class Engine:
    """Load an engine directory and execute it (TRTModule parity)."""

    def __init__(self, path: str, device=None, dtype=jnp.float32):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.kind = self.meta["kind"]
        self.dtype = dtype
        self._device = device

        if self.kind == "detect":
            cfg_kw = self.meta.get("detect_cfg", {})
            if "input_size" in cfg_kw:
                cfg_kw["input_size"] = tuple(cfg_kw["input_size"])
            if "strides" in cfg_kw:
                cfg_kw["strides"] = tuple(cfg_kw["strides"])
            self.det_cfg = DetectConfig(**cfg_kw)
            spec = dataclasses.replace(
                YOLOV8_VARIANTS[self.det_cfg.variant],
                num_classes=self.det_cfg.num_classes,
                reg_max=self.det_cfg.reg_max, strides=self.det_cfg.strides)
            if "det_spec" in self.meta:  # explicit overrides (custom scales)
                spec = dataclasses.replace(spec, **self.meta["det_spec"])
            self.model = YOLOv8(spec, fused=True)
            template = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, *self.det_cfg.input_size, 3), dtype))
            h, w = self.det_cfg.input_size
            self.inp_info = [type("Io", (), {"shape": (1, 3, h, w)})()]
            self._desired = list(DETECT_OUTPUTS)
        elif self.kind == "classify":
            sp = self.meta.get("vit_spec", {})
            self.vit_spec = ViTSpec(**sp)
            self.num_classes = self.meta.get("num_classes", 5)
            self.model = ViTClassifier(self.vit_spec, self.num_classes,
                                       dtype=dtype)
            s = self.vit_spec.img_size
            template = self.model.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, s, s, 3), dtype))
            self.inp_info = [type("Io", (), {"shape": (1, 3, s, s)})()]
            self._desired = ["output"]
        else:
            raise ValueError(f"unknown engine kind {self.kind!r}")

        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            self.params = flax.serialization.from_bytes(template, f.read())
        if device is not None:
            self.params = jax.device_put(self.params, device)
        # one jit wrapper: jax caches per input shape/dtype itself, and the
        # output selection (set_desired) is host-side, after the call
        self._fn = jax.jit(self._forward)

    # ---- TRTModule API ----------------------------------------------------
    def set_desired(self, names: list[str]) -> None:
        """Select/order the outputs returned by __call__
        (parity: `/root/reference/app.py:29`)."""
        self._desired = list(names)

    def __call__(self, tensor):
        x = _maybe_nchw_to_nhwc(jnp.asarray(tensor))
        outs = self._fn(self.params, x.astype(self.dtype))
        picked = tuple(outs[n] for n in self._desired)
        return picked if len(picked) > 1 else picked[0]

    # -----------------------------------------------------------------------
    def _forward(self, params, x):
        if self.kind == "detect":
            head = self.model.apply(params, x)
            num, boxes, scores, labels = decode_predictions(head, self.det_cfg)
            return {"num_dets": num, "bboxes": boxes,
                    "scores": scores, "labels": labels}
        logits = self.model.apply(params, x)
        return {"output": logits}
