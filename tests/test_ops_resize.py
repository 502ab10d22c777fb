"""Golden tests: resize/letterbox ops vs OpenCV (SURVEY.md §4 plan (a))."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.ops import resize_nearest, resize_bilinear, letterbox
from yolov8_vit_tpu.ops.letterbox import letterbox_params


def _rand_img(h, w, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((480, 640), (224, 224)),
    ((123, 77), (224, 224)),
    ((300, 300), (224, 224)),
    ((224, 224), (224, 224)),
    ((1080, 1920), (224, 224)),
    ((50, 40), (224, 224)),   # upscale
])
def test_nearest_matches_cv2(in_hw, out_hw):
    img = _rand_img(*in_hw)
    ours = np.asarray(resize_nearest(jnp.asarray(img), out_hw))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((480, 640), (320, 320)),
    ((123, 77), (64, 96)),
    ((100, 100), (640, 640)),
])
def test_bilinear_matches_cv2_float(in_hw, out_hw):
    img = _rand_img(*in_hw).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_bilinear_uint8_close_to_cv2():
    img = _rand_img(480, 640)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (320, 320))).astype(np.int32)
    ref = cv2.resize(img, (320, 320), interpolation=cv2.INTER_LINEAR).astype(np.int32)
    # cv2 uses fixed-point interpolation for uint8; allow off-by-one
    assert np.abs(ours - ref).max() <= 1


def _cv2_letterbox(im, new_wh=(640, 640), color=(114, 114, 114)):
    """Host reference letterbox replicating the documented semantics
    (/root/reference/YOLOTensorRT_yolodet_py_解读.md:67-78)."""
    shape = im.shape[:2]
    r = min(new_wh[0] / shape[1], new_wh[1] / shape[0])
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw = (new_wh[0] - new_unpad[0]) / 2
    dh = (new_wh[1] - new_unpad[1]) / 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right,
                            cv2.BORDER_CONSTANT, value=color)
    return im, r, (dw, dh)


@pytest.mark.parametrize("in_hw", [(480, 640), (720, 1280), (640, 640),
                                   (333, 501), (1000, 250)])
def test_letterbox_matches_reference_semantics(in_hw):
    img = _rand_img(*in_hw).astype(np.float32)
    ours, r, (dw, dh) = letterbox(jnp.asarray(img), (640, 640))
    ref, r2, (dw2, dh2) = _cv2_letterbox(img, (640, 640))
    assert abs(r - r2) < 1e-9
    assert abs(dw - dw2) < 1e-9 and abs(dh - dh2) < 1e-9
    assert ours.shape == ref.shape == (640, 640, 3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-3)


def test_letterbox_params_static():
    new_h, new_w, r, dw, dh, top, left = letterbox_params((480, 640), (640, 640))
    assert (new_h, new_w) == (480, 640)
    assert r == 1.0 and dh == 80.0 and top == 80


def test_letterbox_batched():
    imgs = np.stack([_rand_img(480, 640, seed=i).astype(np.float32)
                     for i in range(4)])
    out, r, dwdh = letterbox(jnp.asarray(imgs), (640, 640))
    assert out.shape == (4, 640, 640, 3)
    single, _, _ = letterbox(jnp.asarray(imgs[1]), (640, 640))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single))
