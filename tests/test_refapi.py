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


def test_build_model_fresh_init():
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                   backbone_classes=16)

    class CFG:
        num_classes = 5

    model, params = refapi.build_model(CFG, "vit_base_patch8_224", None,
                                       spec=spec)
    out = jax.jit(model.apply)(params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 5)
