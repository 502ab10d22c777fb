"""BatchRunner: decode -> resolution-bucketed fused inference -> unpack."""
import os

import numpy as np
import cv2
import jax
import pytest

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.serve.batch_runner import BatchRunner


@pytest.fixture(scope="module")
def runner():
    pipe = TwoStagePipeline(
        det_cfg=DetectConfig(input_size=(64, 64), variant="n",
                             nms_pre_topk=64, nms_topk=16),
        vit_spec=ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                         backbone_classes=40),
        classify_budget=2)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    return BatchRunner(pipe, params, max_batch=4)


def _imgs(tmp_path, sizes):
    paths = []
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}_{h}x{w}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_run_paths_mixed_sizes_and_bad_file(runner, tmp_path):
    paths = _imgs(tmp_path, [(48, 80), (48, 80), (64, 64)])
    bad = str(tmp_path / "broken.jpg")
    open(bad, "wb").write(b"not an image")
    paths.append(bad)

    results = runner.run_paths(paths)
    assert len(results) == 4
    assert results[3] is None                 # bad file flagged, not crashed
    for r in results[:3]:
        assert r["boxes"].shape == (16, 4)
        assert r["final_valid"].dtype == bool
        assert r["num_dets"] >= 0

    # results map back to input order: same-size images must have
    # identical outputs when their pixels are identical
    r0 = runner.run_paths([paths[0]])[0]
    np.testing.assert_allclose(r0["boxes"], results[0]["boxes"], atol=1e-3)


def test_flatten_contract(runner, tmp_path):
    paths = _imgs(tmp_path, [(64, 64)])
    results = runner.run_paths(paths)
    rows = runner.flatten(paths, results)
    for row in rows:
        name, cls_id, conf, x1, y1, x2, y2 = row
        assert name == os.path.basename(paths[0])
        assert 0 <= cls_id < 5 and 0.0 <= conf <= 1.0
        assert x2 >= x1 and y2 >= y1

    objs = runner.to_objects(results[0])
    assert all(set(o) == {"sort", "xmin", "ymin", "xmax", "ymax"}
               for o in objs)
