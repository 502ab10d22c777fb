"""Augmentation pipeline invariants (train/augment.py)."""
import numpy as np

from yolov8_vit_tpu.train.augment import (train_transform, eval_transform,
                                          resize_nearest_np)


def _img(h=100, w=80):
    return np.random.default_rng(0).integers(0, 256, (h, w, 3),
                                             dtype=np.uint8)


def test_eval_transform_deterministic_and_bounded():
    img = _img()
    a = eval_transform(img, 224)
    b = eval_transform(img, 224)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (224, 224, 3) and a.dtype == np.float32
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_eval_matches_cv2_nearest_normalize():
    import cv2
    img = _img()
    ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_NEAREST)
    ref = ref.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(eval_transform(img, 224), ref, atol=1e-6)


def test_train_transform_seeded_reproducible():
    img = _img()
    a = train_transform(img, np.random.default_rng(5), 224)
    b = train_transform(img, np.random.default_rng(5), 224)
    np.testing.assert_array_equal(a, b)
    c = train_transform(img, np.random.default_rng(6), 224)
    assert not np.array_equal(a, c)


def test_train_transform_output_contract():
    img = _img(40, 60)
    for seed in range(8):  # hit all stochastic branches across seeds
        out = train_transform(img, np.random.default_rng(seed), 224)
        assert out.shape == (224, 224, 3)
        assert out.dtype == np.float32
        assert np.isfinite(out).all()
        assert out.min() >= -1.01 and out.max() <= 1.01
