"""Host-side training augmentations (numpy), reproducing the reference's
albumentations pipeline (`/root/reference/utils/trainClass.py:197-223`):

  train: Resize(224, nearest) -> HFlip(.5) -> Normalize(.5,.5)
         -> [RandomCrop(200) + PadIfNeeded](p=.25)
         -> ShiftScaleRotate(shift .0625, scale .05, rot 10deg, p=.25)
         -> ChannelShuffle(.5)
         -> [GridDistortion(5, .05) | ElasticTransform](p=.25)
         -> CoarseDropout(5-8 holes of size//20, p=.5)
  eval:  Resize(224, nearest) -> Normalize(.5,.5)

Augmentation runs on host workers feeding the device queue (the reference
runs albumentations in-process with num_workers=0, SURVEY.md §2.3).  These
are stochastic training transforms — behavioral, not bit-level, parity.
"""
from __future__ import annotations

import numpy as np
import cv2


def resize_nearest_np(img: np.ndarray, size: int = 224) -> np.ndarray:
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_NEAREST)


def normalize_pm1_np(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (mean=std=0.5 over [0,1])."""
    return img.astype(np.float32) / 255.0 * 2.0 - 1.0


def train_transform(img: np.ndarray, rng: np.random.Generator,
                    size: int = 224) -> np.ndarray:
    """uint8 HWC RGB any size -> float32 (size, size, 3) in [-1, 1]."""
    img = resize_nearest_np(img, size)

    if rng.random() < 0.5:  # HorizontalFlip
        img = img[:, ::-1]

    out = normalize_pm1_np(img)

    if rng.random() < 0.25:  # RandomCrop(200) + PadIfNeeded
        ch = cw = min(200, size)  # reference always has size=224>200; clamp
        # keeps the transform well-defined for smaller test resolutions
        y0 = rng.integers(0, size - ch + 1)
        x0 = rng.integers(0, size - cw + 1)
        crop = out[y0:y0 + ch, x0:x0 + cw]
        pad_y = size - ch
        pad_x = size - cw
        top = pad_y // 2
        left = pad_x // 2
        out = np.pad(crop, ((top, pad_y - top), (left, pad_x - left), (0, 0)),
                     constant_values=0.0)

    if rng.random() < 0.25:  # ShiftScaleRotate
        shift = rng.uniform(-0.0625, 0.0625, 2) * size
        scale = 1.0 + rng.uniform(-0.05, 0.05)
        angle = rng.uniform(-10, 10)
        m = cv2.getRotationMatrix2D((size / 2, size / 2), angle, scale)
        m[:, 2] += shift
        out = cv2.warpAffine(out, m, (size, size),
                             borderMode=cv2.BORDER_REFLECT_101)

    if rng.random() < 0.5:  # ChannelShuffle
        out = out[..., rng.permutation(3)]

    if rng.random() < 0.25:  # GridDistortion | ElasticTransform
        if rng.random() < 0.5:
            out = _grid_distortion(out, rng, num_steps=5, distort=0.05)
        else:
            out = _elastic(out, rng, alpha=1.0, sigma=50.0)

    if rng.random() < 0.5:  # CoarseDropout
        holes = rng.integers(5, 9)
        hmax = max(size // 20, 1)
        for _ in range(holes):
            hh = rng.integers(1, hmax + 1)
            ww = rng.integers(1, hmax + 1)
            y0 = rng.integers(0, size - hh + 1)
            x0 = rng.integers(0, size - ww + 1)
            out[y0:y0 + hh, x0:x0 + ww] = 0.0

    return np.ascontiguousarray(out, np.float32)


def eval_transform(img: np.ndarray, size: int = 224) -> np.ndarray:
    return normalize_pm1_np(resize_nearest_np(img, size))


def _grid_distortion(img, rng, num_steps=5, distort=0.05):
    h, w = img.shape[:2]
    xs = np.linspace(0, w, num_steps + 1)
    ys = np.linspace(0, h, num_steps + 1)
    dx = 1 + rng.uniform(-distort, distort, num_steps + 1)
    dy = 1 + rng.uniform(-distort, distort, num_steps + 1)
    map_x = np.interp(np.arange(w), xs, np.cumsum(np.diff(
        xs, prepend=0) * dx))
    map_y = np.interp(np.arange(h), ys, np.cumsum(np.diff(
        ys, prepend=0) * dy))
    map_x = np.clip(map_x * (w - 1) / max(map_x[-1], 1e-6), 0, w - 1)
    map_y = np.clip(map_y * (h - 1) / max(map_y[-1], 1e-6), 0, h - 1)
    gx, gy = np.meshgrid(map_x.astype(np.float32), map_y.astype(np.float32))
    return cv2.remap(img, gx, gy, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT_101)


def _elastic(img, rng, alpha=1.0, sigma=50.0):
    h, w = img.shape[:2]
    dx = cv2.GaussianBlur((rng.random((h, w)).astype(np.float32) * 2 - 1),
                          (0, 0), sigma) * alpha
    dy = cv2.GaussianBlur((rng.random((h, w)).astype(np.float32) * 2 - 1),
                          (0, 0), sigma) * alpha
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return cv2.remap(img, gx + dx, gy + dy, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT_101)
