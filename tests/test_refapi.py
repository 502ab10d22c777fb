"""refapi façade: the reference `utils/utils.py` surface resolves and
`build_model` loads a real Network_Wrapper-layout .pth
(`/root/reference/utils/utils.py:59-87`)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu import refapi
from yolov8_vit_tpu.models.vit import ViTSpec

from torch_refs import TimmViT, NetworkWrapper


def test_surface_complete():
    # every public name from the reference module exists here
    for name in ["download_images", "Network_Wrapper", "build_model",
                 "AliyunOss", "generate_annotation", "indent",
                 "location2lalo", "log"]:
        assert callable(getattr(refapi, name)), name


def test_spec_from_timm_name():
    s = refapi.spec_from_timm_name("vit_base_patch8_224.augreg_in21k")
    assert (s.img_size, s.patch, s.dim, s.depth, s.heads) == \
        (224, 8, 768, 12, 12)
    s = refapi.spec_from_timm_name("vit_small_patch16_224")
    assert (s.dim, s.heads) == (384, 6)
    s = refapi.spec_from_timm_name("vit_tiny_patch16_224")
    assert (s.dim, s.depth, s.heads) == (192, 12, 3)
    with pytest.raises(ValueError):
        refapi.spec_from_timm_name("resnet50")


def test_build_model_loads_wrapper_pth(tmp_path):
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
    torch.manual_seed(0)
    net = NetworkWrapper(
        TimmViT(img_size=32, patch=8, dim=64, depth=2, heads=4,
                num_classes=40), num_class=5, backbone_classes=40)
    p = tmp_path / "wrapper.pth"
    torch.save(net.state_dict(), p)

    class CFG:
        num_classes = 5

    model, params = refapi.build_model(CFG, "vit_base_patch8_224", str(p),
                                       spec=spec)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    want = net(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_train_module_surfaces():
    from yolov8_vit_tpu.refapi import trainClass, trainYolo, class_config
    for name in ["set_seed", "cosine_anneal_schedule", "crop_image",
                 "build_model", "build_loss", "train", "classExport",
                 "buildInferModel", "deliver", "retrain",
                 "Network_Wrapper"]:
        assert callable(getattr(trainClass, name)), name
    for name in ["train", "yolo2dict", "yoloRetrain"]:
        assert callable(getattr(trainYolo, name)), name
    assert class_config.CFG().num_classes == 5
    assert callable(class_config.convert) and callable(class_config.xml2txt)


def test_crop_image_inflation(tmp_path):
    """Eval-mode inflation is (w//10)//2 per side, clamped — the reference
    CODE behavior (`/root/reference/utils/trainClass.py:85-91`)."""
    from PIL import Image
    from yolov8_vit_tpu.refapi import trainClass
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    p = tmp_path / "im.png"
    Image.fromarray(img).save(p)
    crop = trainClass.crop_image(str(p), 20, 30, 60, 70, training=False)
    # dis_x = 40//10 = 4 -> 2 per side: x [18, 62), y [28, 72)
    assert crop.shape == (44, 44, 3)
    np.testing.assert_array_equal(crop, img[28:72, 18:62])


def test_class_export_roundtrip(tmp_path):
    from yolov8_vit_tpu.refapi import trainClass
    from yolov8_vit_tpu.config import CFG
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)
    cfg = CFG()
    out = trainClass.classExport(cfg, None, None,
                                 out_dir=str(tmp_path / "eng"), spec=spec)
    eng = trainClass.buildInferModel(out)
    assert eng is not None
    logits = eng(jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, cfg.num_classes)
    assert trainClass.buildInferModel(str(tmp_path / "missing")) is None


def test_build_model_fresh_init():
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)

    class CFG:
        num_classes = 5

    model, params = refapi.build_model(CFG, "vit_base_patch8_224", None,
                                       spec=spec)
    out = jax.jit(model.apply)(params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 5)
