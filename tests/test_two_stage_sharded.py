"""Data-parallel two-stage inference over the virtual mesh: sharding the
batch must not change any output (the production scaling axis)."""
import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.parallel import make_mesh, shard_batch, replicate


def test_sharded_inference_matches_single_device():
    pipe = TwoStagePipeline(
        det_cfg=DetectConfig(input_size=(64, 64), variant="n",
                             nms_pre_topk=64, nms_topk=16),
        vit_spec=ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                         backbone_classes=40),
        classify_budget=2)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, 64, 64, 3), dtype=np.uint8))

    fn = jax.jit(pipe.__call__)
    ref = jax.tree.map(np.asarray, fn(params, imgs))

    mesh = make_mesh(n_data=8)
    out = fn(replicate(mesh, params), shard_batch(mesh, imgs))
    out = jax.tree.map(np.asarray, out)

    for key in ("num_dets", "det_labels", "final_valid"):
        np.testing.assert_array_equal(out[key], ref[key], err_msg=key)
    np.testing.assert_allclose(out["boxes"], ref["boxes"], rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(out["det_scores"], ref["det_scores"],
                               rtol=1e-4, atol=1e-5)
    # NOTE: cls_labels may differ only in slot *assignment* when the global
    # top-k compaction ties across devices; the set of classified
    # detections must match
    np.testing.assert_array_equal(out["cls_labels"] >= 0,
                                  ref["cls_labels"] >= 0)
