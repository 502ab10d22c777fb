"""Native C++ host pipeline vs the cv2/numpy golden paths."""
import os

import cv2
import numpy as np
import pytest

from yolov8_vit_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="libmtnative.so not built")


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # low-frequency content: JPEG is lossy, keep recompression error small
    img = cv2.resize(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8),
                     (640, 480), interpolation=cv2.INTER_LINEAR)
    path = str(d / "a.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 98])
    return path


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (123, 217, 3), dtype=np.uint8)
    path = str(d / "b.png")
    cv2.imwrite(path, img)
    return path


def test_decode_jpeg_matches_cv2(jpg):
    ours = native.decode_image(jpg)
    ref = cv2.cvtColor(cv2.imread(jpg), cv2.COLOR_BGR2RGB)
    assert ours.shape == ref.shape
    # libjpeg IDCT may differ from cv2's by rounding
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_decode_png_exact(png):
    ours = native.decode_image(png)
    ref = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(ours, ref)


def test_decode_missing_file():
    assert native.decode_image("/nonexistent/x.jpg") is None


def test_letterbox_batch_geometry_and_pixels(png):
    batch, geom, ok = native.load_letterbox_batch([png, png], (640, 640))
    assert ok.all() and batch.shape == (2, 640, 640, 3)
    ref_img = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
    h, w = ref_img.shape[:2]
    r = min(640 / w, 640 / h)
    assert geom[0, 0] == pytest.approx(r)
    nw, nh = round(w * r), round(h * r)
    ref = cv2.resize(ref_img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = int(round((640 - nh) / 2 - 0.1))
    left = int(round((640 - nw) / 2 - 0.1))
    region = batch[0, top:top + nh, left:left + nw]
    assert np.abs(region.astype(int) - ref.astype(int)).max() <= 1
    # padding value
    assert (batch[0, :top] == 114).all()


def test_letterbox_batch_bad_file_flagged(png):
    batch, geom, ok = native.load_letterbox_batch(
        [png, "/nonexistent/y.jpg"], (64, 64))
    assert ok.tolist() == [True, False]
    assert (batch[1] == 0).all()


def test_crop_resize_matches_golden(png):
    img = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
    box = (10, 15, 150, 100)
    ours = native.crop_resize_nearest(img, box, (224, 224))
    x1, y1, x2, y2 = box
    crop = img[y1:y2, x1:x2]
    bh, bw = crop.shape[:2]
    sx = np.minimum(np.arange(224) * bw // 224, bw - 1)
    sy = np.minimum(np.arange(224) * bh // 224, bh - 1)
    np.testing.assert_array_equal(ours, crop[sy[:, None], sx[None, :]])


def test_decode_bmp_exact(tmp_path):
    """Uncompressed 24-bit BMP (serving accepts .bmp uploads) decodes
    bit-exactly; width forces 4-byte row padding."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)   # 53*3 % 4 != 0
    path = str(tmp_path / "c.bmp")
    cv2.imwrite(path, img[..., ::-1])   # cv2 writes BGR
    ours = native.decode_image(path)
    np.testing.assert_array_equal(ours, img)


def test_letterbox_rounding_matches_python(tmp_path):
    """Half-to-even rounding of new_w/new_h: 1277*0.5 = 638.5 must round
    like Python round() (638), not lround (639)."""
    from yolov8_vit_tpu.ops.letterbox import letterbox_params
    img = np.full((1277, 1280, 3), 90, np.uint8)
    path = str(tmp_path / "r.png")
    cv2.imwrite(path, img)
    batch, geom, ok = native.load_letterbox_batch([path], (640, 640))
    assert ok[0]
    _nh, _nw, ratio, dw, dh, _top, _left = letterbox_params((1277, 1280),
                                                            (640, 640))
    assert geom[0, 0] == pytest.approx(ratio)
    assert geom[0, 1] == pytest.approx(dw)
    assert geom[0, 2] == pytest.approx(dh)


def test_decode_bmp_rejects_absurd_dims(tmp_path):
    """A crafted header claiming huge dimensions must not allocate
    (uploads reach this decoder; the dims cap bounds the commit)."""
    import struct
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 100000, 100000, 1, 24,
                       0, 0, 0, 0, 0, 0)
    p = tmp_path / "bomb.bmp"
    p.write_bytes(hdr)
    assert native.decode_image(str(p)) is None


def test_decode_ppm_rejects_absurd_dims(tmp_path):
    """A 29-byte crafted PPM header claiming 2e9 x 2e9 used to throw
    std::length_error inside resize() — std::terminate of the whole
    process (SIGABRT), even from a loader-pool thread.  Must reject
    gracefully like the BMP decoder; a real PPM still decodes."""
    p = tmp_path / "bomb.ppm"
    p.write_bytes(b"P6 2000000000 2000000000 255\n")
    assert native.decode_image(str(p)) is None
    neg = tmp_path / "neg.ppm"
    neg.write_bytes(b"P6 -4 4 255\n")
    assert native.decode_image(str(neg)) is None
    ok = tmp_path / "ok.ppm"
    ok.write_bytes(b"P6 2 2 255\n" + bytes(12))
    img = native.decode_image(str(ok))
    assert img is not None and img.shape == (2, 2, 3)
