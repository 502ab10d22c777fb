"""Generate key->shape manifests of the real checkpoints the reference uses.

The reference loads two torch checkpoints whose exact state-dict layouts the
converters (yolov8_vit_tpu/runtime/convert.py) must consume:

  * ultralytics YOLOv8-s detection `best.pt`
    (`/root/reference/utils/trainYolo.py:13`, `.MISSING_LARGE_BLOBS:1-3`)
  * timm `vit_base_patch8_224.augreg_in21k` (num_classes=1000) wrapped in
    `Network_Wrapper` -> `best.pth` (`/root/reference/utils/class_config.py:21`,
    `utils/utils.py:59-87`)

This environment has no network and no timm/ultralytics packages, so the
manifests are AUTHORED FROM THE PUBLISHED LAYOUTS of those libraries
(ultralytics yolov8.yaml module table + BaseModel naming `model.{idx}.{...}`;
timm vision_transformer.py parameter naming), written out independently of
the repo's converter so the test in tests/test_checkpoint_manifests.py
cross-checks two separate encodings of the format.

Regenerate with:  python tools/gen_manifests.py
"""
from __future__ import annotations

import json
import os


def _mk(c: float, maxc: int, width: float) -> int:
    c = min(c, maxc) * width
    return max(8, int(c + 4) // 8 * 8)


def yolov8_manifest(variant: str = "s", nc: int = 5) -> dict[str, list[int]]:
    """ultralytics DetectionModel.state_dict() for the v8 detect yaml.

    Naming rules (ultralytics nn/tasks.py): layers are `model.{idx}`, the
    Conv wrapper is `.conv.weight` + `.bn.{weight,bias,running_mean,
    running_var,num_batches_tracked}`, C2f holds `.cv1/.cv2` Convs and
    bottlenecks `.m.{j}.cv1/.cv2`, SPPF `.cv1/.cv2`, Detect has box branch
    `.cv2.{i}` = [Conv, Conv, Conv2d(+bias)], cls branch `.cv3.{i}`, and the
    fixed DFL expectation conv `.dfl.conv.weight`.
    """
    depth, width, maxc = {"n": (1 / 3, 0.25, 1024), "s": (1 / 3, 0.50, 1024),
                          "m": (2 / 3, 0.75, 768), "l": (1.0, 1.0, 512),
                          "x": (1.0, 1.25, 512)}[variant]

    def ch(c):
        return _mk(c, maxc, width)

    def n_(n):
        return max(round(n * depth), 1)

    m: dict[str, list[int]] = {}

    def bn(p, c):
        m[f"{p}.bn.weight"] = [c]
        m[f"{p}.bn.bias"] = [c]
        m[f"{p}.bn.running_mean"] = [c]
        m[f"{p}.bn.running_var"] = [c]
        m[f"{p}.bn.num_batches_tracked"] = []

    def conv(p, cin, cout, k):
        m[f"{p}.conv.weight"] = [cout, cin, k, k]
        bn(p, cout)

    def c2f(p, cin, cout, n, _shortcut):
        c = cout // 2
        conv(f"{p}.cv1", cin, 2 * c, 1)
        conv(f"{p}.cv2", (2 + n) * c, cout, 1)
        for j in range(n):
            conv(f"{p}.m.{j}.cv1", c, c, 3)
            conv(f"{p}.m.{j}.cv2", c, c, 3)

    # backbone (yolov8.yaml)
    conv("model.0", 3, ch(64), 3)
    conv("model.1", ch(64), ch(128), 3)
    c2f("model.2", ch(128), ch(128), n_(3), True)
    conv("model.3", ch(128), ch(256), 3)
    c2f("model.4", ch(256), ch(256), n_(6), True)
    conv("model.5", ch(256), ch(512), 3)
    c2f("model.6", ch(512), ch(512), n_(6), True)
    conv("model.7", ch(512), ch(1024), 3)
    c2f("model.8", ch(1024), ch(1024), n_(3), True)
    conv("model.9.cv1", ch(1024), ch(1024) // 2, 1)          # SPPF
    conv("model.9.cv2", ch(1024) // 2 * 4, ch(1024), 1)
    # head (10 Upsample / 11 Concat have no params)
    c2f("model.12", ch(1024) + ch(512), ch(512), n_(3), False)
    c2f("model.15", ch(512) + ch(256), ch(256), n_(3), False)
    conv("model.16", ch(256), ch(256), 3)
    c2f("model.18", ch(512) + ch(256), ch(512), n_(3), False)
    conv("model.19", ch(512), ch(512), 3)
    c2f("model.21", ch(1024) + ch(512), ch(1024), n_(3), False)
    # Detect
    chs = [ch(256), ch(512), ch(1024)]
    reg_max = 16
    c2 = max(16, chs[0] // 4, reg_max * 4)
    c3 = max(chs[0], min(nc, 100))
    for i, cin in enumerate(chs):
        conv(f"model.22.cv2.{i}.0", cin, c2, 3)
        conv(f"model.22.cv2.{i}.1", c2, c2, 3)
        m[f"model.22.cv2.{i}.2.weight"] = [4 * reg_max, c2, 1, 1]
        m[f"model.22.cv2.{i}.2.bias"] = [4 * reg_max]
        conv(f"model.22.cv3.{i}.0", cin, c3, 3)
        conv(f"model.22.cv3.{i}.1", c3, c3, 3)
        m[f"model.22.cv3.{i}.2.weight"] = [nc, c3, 1, 1]
        m[f"model.22.cv3.{i}.2.bias"] = [nc]
    m["model.22.dfl.conv.weight"] = [1, reg_max, 1, 1]
    return m


def vit_wrapper_manifest(patch: int = 8, img: int = 224, dim: int = 768,
                         depth: int = 12, backbone_classes: int = 1000,
                         nc: int = 5) -> dict[str, list[int]]:
    """Network_Wrapper(timm ViT).state_dict() (timm vision_transformer.py
    naming under the wrapper's `model.` prefix + `fc.{1,3}` head)."""
    tokens = (img // patch) ** 2 + 1
    hidden = dim * 4
    m: dict[str, list[int]] = {
        "model.cls_token": [1, 1, dim],
        "model.pos_embed": [1, tokens, dim],
        "model.patch_embed.proj.weight": [dim, 3, patch, patch],
        "model.patch_embed.proj.bias": [dim],
        "model.norm.weight": [dim],
        "model.norm.bias": [dim],
        "model.head.weight": [backbone_classes, dim],
        "model.head.bias": [backbone_classes],
        "fc.1.weight": [128, backbone_classes],
        "fc.1.bias": [128],
        "fc.3.weight": [nc, 128],
        "fc.3.bias": [nc],
    }
    for i in range(depth):
        p = f"model.blocks.{i}"
        m[f"{p}.norm1.weight"] = [dim]
        m[f"{p}.norm1.bias"] = [dim]
        m[f"{p}.attn.qkv.weight"] = [3 * dim, dim]
        m[f"{p}.attn.qkv.bias"] = [3 * dim]
        m[f"{p}.attn.proj.weight"] = [dim, dim]
        m[f"{p}.attn.proj.bias"] = [dim]
        m[f"{p}.norm2.weight"] = [dim]
        m[f"{p}.norm2.bias"] = [dim]
        m[f"{p}.mlp.fc1.weight"] = [hidden, dim]
        m[f"{p}.mlp.fc1.bias"] = [hidden]
        m[f"{p}.mlp.fc2.weight"] = [dim, hidden]
        m[f"{p}.mlp.fc2.bias"] = [dim]
    return m


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "manifests")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "yolov8s_nc5_state_dict.json"), "w") as f:
        json.dump(yolov8_manifest("s", 5), f, indent=1)
    with open(os.path.join(out, "vit_b8_wrapper_state_dict.json"), "w") as f:
        json.dump(vit_wrapper_manifest(), f, indent=1)
    print(f"manifests written to {out}")


if __name__ == "__main__":
    main()
