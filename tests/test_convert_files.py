"""Checkpoint converters from real .pt/.pth files (torch.save round-trip)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.runtime.convert import (load_torch_state_dict,
                                            convert_vit_wrapper)
from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
from torch_refs import TimmViT, NetworkWrapper


def test_load_and_convert_pth_file(tmp_path):
    torch.manual_seed(0)
    model = NetworkWrapper(TimmViT(img_size=32, patch=8, dim=64, depth=2,
                                   heads=4, num_classes=40), 5,
                           backbone_classes=40).eval()
    p = str(tmp_path / "best.pth")
    torch.save(model.state_dict(), p)

    sd = load_torch_state_dict(p)
    assert "model.blocks.0.attn.qkv.weight" in sd
    params = convert_vit_wrapper(sd, depth=2)
    spec = ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                   backbone_classes=40)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(ViTClassifier(spec, 5).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_load_module_checkpoint(tmp_path):
    """torch.save of the MODULE (not state_dict) loads only behind
    allow_pickle=True (untrusted pickles are refused by default)."""
    import pytest
    torch.manual_seed(1)
    model = NetworkWrapper(TimmViT(img_size=32, patch=8, dim=64, depth=1,
                                   heads=4, num_classes=16), 5,
                           backbone_classes=16)
    p = str(tmp_path / "full.pth")
    torch.save(model, p)
    with pytest.raises(ValueError, match="weights_only"):
        load_torch_state_dict(p)
    sd = load_torch_state_dict(p, allow_pickle=True)
    assert "fc.1.weight" in sd
