"""Image tensor preprocessing (device-side)."""
from __future__ import annotations

import jax.numpy as jnp


def blob(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 HWC RGB (possibly batched) -> float32 in [0, 1].

    Equivalent of the reference's `blob()` (HWC -> normalized NCHW,
    `/root/reference/YOLOTensorRT_yolodet_py_解读.md:28-31,73-75`) except the
    layout stays NHWC — the TPU-native conv layout; there is no separate
    transpose because XLA lays tensors out itself.
    """
    return img.astype(jnp.float32) / 255.0


def normalize_pm1(img01: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0,1] float images with mean=std=0.5 -> [-1, 1].

    Classifier-stage normalization, parity with
    `A.Normalize(mean=[0.5]*3, std=[0.5]*3)`
    (`/root/reference/app.py:39-42`, `/root/reference/utils/trainClass.py:202`).
    """
    return img01 * 2.0 - 1.0
