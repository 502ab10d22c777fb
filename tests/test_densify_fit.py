"""fit_detect_head: content-responsive head at production density.

The bench headline runs a scene of planted covers through a head whose
final P3 1x1 cls conv was ridge-fitted on the frozen random backbone's
features (utils/densify.py module docstring has the why).  This pins the
property the headline's honesty rests on: detection counts TRACK scene
content — empty frames detect nothing, frames with covers detect them —
on held-out frames the fit never saw.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
from yolov8_vit_tpu.models.vit import ViTSpec
from yolov8_vit_tpu.utils.densify import fit_detect_head, make_cover_scenes

SIZE = 64


@pytest.fixture(scope="module")
def fitted():
    pipe = TwoStagePipeline(
        det_cfg=DetectConfig(input_size=(SIZE, SIZE), variant="n",
                             nms_pre_topk=64, nms_topk=16),
        vit_spec=ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                         backbone_classes=40),
        classify_budget=2)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    fit_imgs, fit_covers = make_cover_scenes(rng, 8, (SIZE, SIZE), lam=1.5)
    params = fit_detect_head(params, pipe, fit_imgs, fit_covers)
    return pipe, params, rng


def test_fitted_head_tracks_content_on_held_out_scenes(fitted):
    pipe, params, rng = fitted
    fn = pipe.jit()
    ev_imgs, ev_covers = make_cover_scenes(rng, 8, (SIZE, SIZE), lam=1.5)
    empty_imgs, _ = make_cover_scenes(rng, 4, (SIZE, SIZE), lam=0.0)
    det = np.asarray(fn(params, jnp.asarray(ev_imgs))["final_valid"]).sum(1)
    det0 = np.asarray(
        fn(params, jnp.asarray(empty_imgs))["final_valid"]).sum(1)
    true = np.array([len(c) for c in ev_covers])
    # noise-only frames: nothing to detect, nothing detected
    assert det0.sum() == 0, f"empty scenes detected {det0}"
    # cover frames: detections exist and appear only where covers exist
    assert det.sum() >= 3, f"cover scenes under-detected: {det} vs {true}"
    assert np.all(true[det > 0] > 0), \
        f"detections on cover-free frames: det={det} true={true}"


def test_fitted_head_cls_conv_is_the_only_cls_change(fitted):
    """The fit rewrites ONLY head output convs (cls{i}_2 / box0_2): the
    backbone the features came from must stay byte-identical, or the fit
    would be circular."""
    pipe, params, _ = fitted
    fresh = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    head_new = params["det"]["params"]["detect"]
    head_old = fresh["det"]["params"]["detect"]
    changed = {k for k in head_new
               if not jax.tree.all(jax.tree.map(
                   lambda a, b: bool(np.array_equal(a, b)),
                   head_new[k], head_old[k]))}
    assert changed == {"cls0_2", "cls1_2", "cls2_2", "box0_2"}, changed
    det_new = {k: v for k, v in params["det"]["params"].items()
               if k != "detect"}
    det_old = {k: v for k, v in fresh["det"]["params"].items()
               if k != "detect"}
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.array_equal(a, b)), det_new, det_old)), \
        "backbone/neck params changed"


def test_fit_requires_covers(fitted):
    pipe, _, _ = fitted
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(1))
    imgs, covers = make_cover_scenes(np.random.default_rng(0), 4,
                                     (SIZE, SIZE), lam=0.0)
    with pytest.raises(ValueError, match="no covers"):
        fit_detect_head(params, pipe, imgs, covers)
