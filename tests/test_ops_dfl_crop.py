"""DFL decode, anchor, crop-and-resize golden tests."""
import numpy as np
import cv2
import jax.numpy as jnp

from yolov8_vit_tpu.ops import make_anchors, dfl_decode, crop_and_resize_nearest


def test_make_anchors_640():
    anchors, strides = map(np.asarray, make_anchors((640, 640)))
    assert anchors.shape == (80 * 80 + 40 * 40 + 20 * 20, 2) == (8400, 2)
    # first level: stride 8, 80x80 grid, +0.5 offset, x fastest
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[1], [1.5, 0.5])
    np.testing.assert_allclose(anchors[80], [0.5, 1.5])
    assert strides[0, 0] == 8 and strides[6400, 0] == 16 and strides[-1, 0] == 32


def test_dfl_decode_golden():
    rng = np.random.default_rng(0)
    a, reg_max = 21, 16
    anchors = rng.uniform(0, 80, (a, 2)).astype(np.float32)
    stride = np.full((a, 1), 8.0, np.float32)
    dist = rng.normal(size=(a, 4 * reg_max)).astype(np.float32)

    # golden numpy: softmax expectation per side, then anchor -lt / +rb, x stride
    d = dist.reshape(a, 4, reg_max)
    p = np.exp(d - d.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ltrb = p @ np.arange(reg_max, dtype=np.float32)
    ref = np.concatenate([anchors - ltrb[:, :2], anchors + ltrb[:, 2:]], -1) * stride

    out = dfl_decode(jnp.asarray(dist), jnp.asarray(anchors), jnp.asarray(stride))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def _golden_crop_resize(img, box, out_hw):
    """Exact-rational nearest mapping — the framework's crop contract."""
    x1, y1, x2, y2 = box
    crop = img[y1:y2, x1:x2]
    bh, bw = crop.shape[:2]
    oh, ow = out_hw
    sx = np.minimum(np.arange(ow) * bw // ow, bw - 1)
    sy = np.minimum(np.arange(oh) * bh // oh, bh - 1)
    return crop[sy[:, None], sx[None, :]]


def test_crop_and_resize_matches_golden():
    """Parity with the reference crop path: PIL crop -> nearest 224
    (/root/reference/utils/trainClass.py:70-93 + :219)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    boxes = np.array([
        [10, 20, 210, 170],
        [0, 0, 640, 480],
        [333, 100, 340, 113],   # tiny box, upscale
    ], np.int32)
    out = np.asarray(crop_and_resize_nearest(jnp.asarray(img),
                                             jnp.asarray(boxes), (224, 224)))
    for i, box in enumerate(boxes):
        np.testing.assert_array_equal(out[i], _golden_crop_resize(img, box, (224, 224)))


def test_crop_and_resize_close_to_cv2():
    """cv2 computes the same mapping in double precision (two roundings);
    deviations are confined to exact-multiple boundary pixels and must stay
    rare (<1%)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    boxes = np.array([[10, 20, 210, 170], [5, 5, 229, 229], [0, 0, 640, 480]],
                     np.int32)
    out = np.asarray(crop_and_resize_nearest(jnp.asarray(img),
                                             jnp.asarray(boxes), (224, 224)))
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        ref = cv2.resize(img[y1:y2, x1:x2], (224, 224),
                         interpolation=cv2.INTER_NEAREST)
        mismatch = (out[i] != ref).any(-1).mean()
        assert mismatch < 0.01, mismatch


def test_crop_degenerate_box_no_nan():
    img = jnp.zeros((64, 64, 3), jnp.uint8)
    boxes = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
    out = crop_and_resize_nearest(img, boxes, (224, 224))
    assert out.shape == (1, 224, 224, 3)


def test_crop_to_patches_matches_crop_plus_patchify_reshape():
    """crop_to_patches == crop_and_resize_nearest -> conv-im2col reshape."""
    import numpy as np
    import jax.numpy as jnp
    from yolov8_vit_tpu.ops.crop import (crop_and_resize_nearest,
                                         crop_to_patches)
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.integers(0, 256, (60, 90, 3), dtype=np.uint8))
    boxes = jnp.asarray([[5, 7, 50, 40], [0, 0, 90, 60], [10, 10, 11, 11]],
                        jnp.int32)
    p, s = 8, 32
    crops = crop_and_resize_nearest(img, boxes, (s, s))
    ref = crops.reshape(3, s // p, p, s // p, p, 3) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(3, (s // p) ** 2, p, p * 3)
    got = crop_to_patches(img, boxes, (s, s), p)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.int32),
                                  np.asarray(ref, np.int32))


def test_vit_patches_input_matches_image_input():
    """ViT fed pre-blocked patches == ViT fed the image (same params)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)
    m = ViTClassifier(spec, 5)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    patches = x.reshape(2, 4, 8, 4, 8, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(2, 16, 8, 24)
    got = m.apply(params, patches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_crop_to_patches_i8_exact_vs_bf16_path():
    """i8 crop (pixel-128) + 128 == the bf16 crop_to_patches values,
    across a batch of source frames."""
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.ops.crop import crop_to_patches, crop_to_patches_i8
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.integers(0, 256, (3, 60, 90, 3), dtype=np.uint8))
    boxes = jnp.asarray([[5, 7, 50, 40], [0, 0, 90, 60], [10, 10, 11, 11],
                         [2, 2, 40, 55]], jnp.int32)
    slot_img = jnp.asarray([0, 2, 1, 2], jnp.int32)
    p, s = 8, 32
    got = crop_to_patches_i8(imgs, slot_img, boxes, (s, s), p)
    assert got.dtype == jnp.int8
    ref = jax.vmap(lambda i, b: crop_to_patches(
        imgs[i], b[None], (s, s), p)[0])(slot_img, boxes)
    np.testing.assert_array_equal(
        np.asarray(got, np.int32) + 128, np.asarray(ref, np.int32))


def test_vit_i8_patches_input_matches_normalized_image_input():
    """ViT fed i8 patches (pixel-128) == ViT fed the [-1,1] image."""
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)
    m = ViTClassifier(spec, 5)
    rng = np.random.default_rng(12)
    pix = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.float32)
    x = jnp.asarray((pix - 127.5) / 127.5, jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    patches = (pix - 128).astype(np.int8) \
        .reshape(2, 4, 8, 4, 8, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(2, 16, 8, 24)
    got = m.apply(params, jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
