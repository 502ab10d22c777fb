"""Host-path inferdet parity pieces: area NMS mirror, crop math, path_to_list."""
import numpy as np
import jax.numpy as jnp

from yolov8_vit_tpu.serve.infer import (_area_nms_host, _inflate,
                                        _crop_nearest_224, path_to_list)
from yolov8_vit_tpu.ops import area_sorted_nms


def test_area_nms_host_matches_device_op():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 600, (24, 2))
    wh = rng.uniform(10, 120, (24, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.4, 1.0, 24).astype(np.float32)  # all above .35
    kept = _area_nms_host(boxes, scores, 0.45)
    mask = np.asarray(area_sorted_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                      jnp.ones(24, bool),
                                      iou_threshold=0.45,
                                      score_threshold=0.35))
    np.testing.assert_array_equal(kept, np.nonzero(mask)[0])


def test_inflate_host_matches_reference_math():
    # w=105 -> dis 10 -> +/-5; h=132 -> dis 13 -> +/-6
    assert _inflate(np.array([100, 50, 205, 182]), 640, 640) == \
        (95, 44, 210, 188)


def test_crop_nearest_degenerate_clamps():
    img = np.zeros((50, 60, 3), np.uint8)
    out = _crop_nearest_224(img, (70, 70, 80, 80))  # fully out of range
    assert out.shape == (224, 224, 3)


def test_path_to_list_variants(tmp_path):
    (tmp_path / "b.png").write_bytes(b"x")
    (tmp_path / "a.jpg").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    out = path_to_list(str(tmp_path))
    assert [p.split("/")[-1] for p in out] == ["a.jpg", "b.png"]
    assert path_to_list(["x.jpg"]) == ["x.jpg"]
    assert path_to_list(str(tmp_path / "a.jpg")) == [str(tmp_path / "a.jpg")]
