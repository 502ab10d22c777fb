"""Hand-written torch reference models for cross-checking (test-only).

These reproduce the reference's model semantics with the exact state-dict
naming of timm / ultralytics / Network_Wrapper, so converter + flax forward
can be validated end-to-end against an independent torch implementation
(SURVEY.md §4 plan (b)) without timm/ultralytics being installed.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn


# --------------------------------------------------------------------------
# timm-style ViT + Network_Wrapper (reference /root/reference/utils/utils.py:59-87)
# --------------------------------------------------------------------------

class TimmAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        qkv = self.qkv(x).reshape(b, t, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(x)


class TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + h


class TimmViT(nn.Module):
    """Pre-norm ViT with timm state-dict naming."""

    def __init__(self, img_size=224, patch=8, dim=768, depth=12, heads=12,
                 num_classes=1000):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        n_tok = (img_size // patch) ** 2 + 1
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, n_tok, dim) * 0.02)
        self.blocks = nn.ModuleList([TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):  # x: NCHW
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


class NetworkWrapper(nn.Module):
    """Reference Network_Wrapper head (utils/utils.py:59-72)."""

    def __init__(self, model, num_class, backbone_classes=1000):
        super().__init__()
        self.model = model
        self.fc = nn.Sequential(
            nn.ReLU(), nn.Linear(backbone_classes, 128),
            nn.ReLU(), nn.Linear(128, num_class))

    def forward(self, x):
        return self.fc(self.model(x))


# --------------------------------------------------------------------------
# ultralytics-style YOLOv8 with `model.{idx}.*` naming
# --------------------------------------------------------------------------

class UConv(nn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class UBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = UConv(c, c, 3)
        self.cv2 = UConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class UC2f(nn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        self.c = cout // 2
        self.cv1 = UConv(cin, 2 * self.c, 1)
        self.cv2 = UConv((2 + n) * self.c, cout, 1)
        self.m = nn.ModuleList(UBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class USPPF(nn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        c_ = cin // 2
        self.cv1 = UConv(cin, c_, 1)
        self.cv2 = UConv(c_ * 4, cout, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class UDetect(nn.Module):
    """Decoupled head emitting raw per-level (box_dist, cls) maps."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(UConv(c, c2, 3), UConv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(UConv(c, c3, 3), UConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)]


class UYOLOv8(nn.Module):
    """ultralytics-naming YOLOv8 (any width/depth) emitting raw head maps."""

    def __init__(self, spec, num_classes=5):
        super().__init__()
        from yolov8_vit_tpu.models.yolov8 import _ch, _n

        def ch(c):
            return _ch(c, spec)

        m = nn.ModuleDict()
        m["0"] = UConv(3, ch(64), 3, 2)
        m["1"] = UConv(ch(64), ch(128), 3, 2)
        m["2"] = UC2f(ch(128), ch(128), _n(3, spec), True)
        m["3"] = UConv(ch(128), ch(256), 3, 2)
        m["4"] = UC2f(ch(256), ch(256), _n(6, spec), True)
        m["5"] = UConv(ch(256), ch(512), 3, 2)
        m["6"] = UC2f(ch(512), ch(512), _n(6, spec), True)
        m["7"] = UConv(ch(512), ch(1024), 3, 2)
        m["8"] = UC2f(ch(1024), ch(1024), _n(3, spec), True)
        m["9"] = USPPF(ch(1024), ch(1024))
        m["12"] = UC2f(ch(1024) + ch(512), ch(512), _n(3, spec), False)
        m["15"] = UC2f(ch(512) + ch(256), ch(256), _n(3, spec), False)
        m["16"] = UConv(ch(256), ch(256), 3, 2)
        m["18"] = UC2f(ch(256) + ch(512), ch(512), _n(3, spec), False)
        m["19"] = UConv(ch(512), ch(512), 3, 2)
        m["21"] = UC2f(ch(512) + ch(1024), ch(1024), _n(3, spec), False)
        m["22"] = UDetect(num_classes, [ch(256), ch(512), ch(1024)],
                          spec.reg_max)
        self.model = m

    def forward(self, x):
        m = self.model
        up = nn.Upsample(scale_factor=2, mode="nearest")
        x = m["1"](m["0"](x))
        x = m["2"](x)
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["9"](m["8"](m["7"](p4)))
        n4 = m["12"](torch.cat([up(p5), p4], 1))
        n3 = m["15"](torch.cat([up(n4), p3], 1))
        o4 = m["18"](torch.cat([m["16"](n3), n4], 1))
        o5 = m["21"](torch.cat([m["19"](o4), p5], 1))
        return m["22"]([n3, o4, o5])
