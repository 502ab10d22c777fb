"""Reference-API façade: the `utils/utils.py` import surface, one module.

BASELINE.json's north star pins "the public API mirrors `utils/utils.py`
and the `trainYolo.py`/`trainClass.py` entry points".  Every name below is
implemented elsewhere in the package under the same name and semantics;
this module collects them so reference-shaped code can do

    from yolov8_vit_tpu import refapi as utils

and keep its call sites (`/root/reference/utils/utils.py:12-291`).  The
only torch-specific signature, `build_model`, becomes a functional
(model, params) pair — flax modules carry no state — loading the SAME
Network_Wrapper `.pth` checkpoints the reference saves.

Submodules mirror the rest of the reference `utils/` package:
`refapi.trainClass`, `refapi.trainYolo`, `refapi.class_config`.
"""
from __future__ import annotations

import re

# 1:1 names (same signatures/behavior as the reference functions)
from yolov8_vit_tpu.serve.downloads import download_images  # noqa: F401
from yolov8_vit_tpu.serve.oss import AliyunOss, make_object_store  # noqa: F401
from yolov8_vit_tpu.serve.geocode import location2lalo  # noqa: F401
from yolov8_vit_tpu.serve.sse import log  # noqa: F401
from yolov8_vit_tpu.data.voc import generate_annotation, indent  # noqa: F401

from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec

_TIMM_NAME = re.compile(
    r"vit_(?P<size>tiny|small|base|large)_patch(?P<patch>\d+)_(?P<img>\d+)")

_DIMS = {"tiny": (192, 12, 3), "small": (384, 12, 6),
         "base": (768, 12, 12),
         "large": (1024, 24, 16)}   # dim, depth, heads


def spec_from_timm_name(model_name: str, **overrides) -> ViTSpec:
    """timm model id (e.g. `vit_base_patch8_224.augreg_in21k`,
    `/root/reference/utils/class_config.py:21`) -> ViTSpec."""
    m = _TIMM_NAME.match(model_name)
    if not m:
        raise ValueError(f"unrecognized timm ViT name: {model_name!r}")
    dim, depth, heads = _DIMS[m["size"]]
    kw = dict(img_size=int(m["img"]), patch=int(m["patch"]),
              dim=dim, depth=depth, heads=heads)
    kw.update(overrides)
    return ViTSpec(**kw)


def Network_Wrapper(model, num_class: int) -> ViTClassifier:
    """Reference `Network_Wrapper(model, num_class)`
    (`/root/reference/utils/utils.py:59-72`): backbone logits -> ReLU ->
    Linear(1000, 128) -> ReLU -> Linear(128, num_class).  `model` is a
    ViTSpec (or a ViT flax module, whose spec is reused)."""
    spec = model if isinstance(model, ViTSpec) else model.spec
    return ViTClassifier(spec, num_classes=num_class)


def build_model(CFG, modelName: str, pretrained_path: str | None,
                spec: ViTSpec | None = None):
    """Reference `build_model(CFG, modelName, pretrained_path)`
    (`/root/reference/utils/utils.py:75-87`): create the timm backbone
    wrapped in Network_Wrapper and load the fine-tuned `.pth`.

    Returns (model, params).  `params` is the converted checkpoint when
    `pretrained_path` is given (runtime.convert.convert_vit_wrapper),
    else a fresh init.  Pass `spec` to override the architecture (tests
    use tiny dims)."""
    import jax
    import jax.numpy as jnp

    spec = spec or spec_from_timm_name(modelName)
    model = Network_Wrapper(spec, CFG.num_classes)
    if pretrained_path:
        from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                                    convert_vit_wrapper)
        sd = load_torch_state_dict(pretrained_path)
        params = jax.tree.map(jnp.asarray,
                              convert_vit_wrapper(sd, depth=spec.depth))
    else:
        s = spec.img_size
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, s, s, 3)))
    return model, params
