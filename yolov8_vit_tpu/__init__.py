"""yolov8_vit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) two-stage detection +
fine-grained classification framework.

Re-designed from scratch with the capabilities of the reference manhole-cover
inspection pipeline (Voyager0587/yolov8-vit): YOLOv8 detection at 640px,
box inflation + crop, ViT fine-grained classification at 224px, serving,
and the full retrain loop — all as idiomatic TPU programs:

 - the hot path (detect -> NMS -> inflate -> crop -> classify) is ONE jitted
   XLA graph with static shapes and zero host round-trips
   (reference: per-image Python loop, `/root/reference/app.py:45-63`);
 - scaling is `jax.sharding.Mesh` + pjit batch/tensor sharding over ICI,
   not NCCL (the reference is single-GPU, `/root/reference/app.py:25`);
 - weights live in JAX pytrees; "engines" are serialized param trees +
   AOT-compiled XLA executables (reference: TensorRT .engine files,
   `/root/reference/app.py:27-29`).
"""

__version__ = "0.1.0"

from yolov8_vit_tpu.config import CFG, DetectConfig, ServiceConfig  # noqa: F401

# `from yolov8_vit_tpu import refapi as utils` gives reference-shaped code
# the `utils/utils.py` import surface (BASELINE.json "public API mirrors
# utils/utils.py"); imported lazily by consumers, not here, to keep bare
# package import light.
