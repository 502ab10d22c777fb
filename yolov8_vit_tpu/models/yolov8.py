"""YOLOv8 detection stack (flax.linen, NHWC) for all size variants.

Capability parity with the engine the reference builds layer-by-layer in
TensorRT — Conv(+SiLU), C2f (split + n Bottlenecks + concat), SPPF backbone,
PAN neck, decoupled DFL detect head
(`/root/reference/docs/YOLO_TensorRT_Technical.md:160-221`,
`/root/reference/tech.md:39-47`) — re-designed as an idiomatic XLA program:
NHWC convs on the MXU, SiLU fused into the conv epilogue by XLA (the TRT
build fuses conv+sigmoid+mul manually, `:179-184`), static shapes per input
size, anchors baked as constants.

Two parameter layouts:
  fused=True  (inference): conv carries a bias, BN already folded — the
              layout checkpoint converters emit, mirroring how ultralytics
              fuses BN at export (SURVEY.md §7 "weight conversion fidelity").
  fused=False (training):  conv(no bias) + BatchNorm (momentum .03/eps 1e-3,
              ultralytics defaults) for from-scratch/fine-tune training.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class YOLOv8Spec:
    depth: float
    width: float
    max_channels: int
    num_classes: int = 5
    reg_max: int = 16
    strides: tuple[int, ...] = (8, 16, 32)


YOLOV8_VARIANTS: dict[str, YOLOv8Spec] = {
    "n": YOLOv8Spec(0.33, 0.25, 1024),
    "s": YOLOv8Spec(0.33, 0.50, 1024),
    "m": YOLOv8Spec(0.67, 0.75, 768),
    "l": YOLOv8Spec(1.00, 1.00, 512),
    "x": YOLOv8Spec(1.00, 1.25, 512),
}


def detect_spec(cfg, overrides=None) -> YOLOv8Spec:
    """YOLOv8Spec from a DetectConfig + optional explicit field overrides
    (engine meta "det_spec") — the ONE place engine load, stablehlo export,
    and the fused pipeline agree on.  Rebuilding the spec ad hoc and
    dropping cfg.reg_max/cfg.strides silently desynchronizes the traced
    head from decode_predictions (reshape error at best, a wrong anchor
    grid at worst)."""
    spec = dataclasses.replace(YOLOV8_VARIANTS[cfg.variant],
                               num_classes=cfg.num_classes,
                               reg_max=cfg.reg_max, strides=cfg.strides)
    if overrides:
        spec = dataclasses.replace(spec, **dict(overrides))
    return spec


def _make_divisible(x: float, div: int = 8) -> int:
    # ultralytics' make_divisible is ceil-based (ultralytics/utils/ops.py);
    # round-to-nearest diverges for custom width scales whose scaled
    # channels aren't multiples of 8 (the named n/s/m/l/x variants all are)
    return max(div, int(math.ceil(x / div)) * div)


def _ch(c: int, spec: YOLOv8Spec) -> int:
    return _make_divisible(min(c, spec.max_channels) * spec.width)


def _n(n: int, spec: YOLOv8Spec) -> int:
    return max(round(n * spec.depth), 1)


class ConvBlock(nn.Module):
    """Conv + (BN) + SiLU.

    The fused (inference) path runs the conv explicitly in the INPUT dtype
    with f32 accumulation: flax's nn.Conv promotes a bf16 input against the
    f32 params to an f32 convolution, silently halving MXU rate — the
    detector's deep stages all flow through here.  Param tree is identical
    to nn.Conv's ({conv: {kernel, bias}}, same initializers)."""
    out: int
    k: int = 1
    s: int = 1
    g: int = 1
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        if self.fused:
            kernel, bias = _ConvParams(
                (self.k, self.k, x.shape[-1] // self.g, self.out),
                name="conv")()
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (self.s, self.s),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.g,
                preferred_element_type=jnp.float32) + bias
            return nn.silu(y).astype(x.dtype)
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(p, p), (p, p)], feature_group_count=self.g,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    e: float = 1.0       # C2f uses expansion 1.0 inside bottlenecks
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out * self.e)
        y = ConvBlock(hidden, 3, fused=self.fused, name="cv1")(x, train)
        y = ConvBlock(self.out, 3, fused=self.fused, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial fusion block (split + n bottlenecks + concat)."""
    out: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.out * self.e)
        y = ConvBlock(2 * c, 1, fused=self.fused, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, fused=self.fused,
                                    name=f"m{i}")(parts[-1], train))
        y = jnp.concatenate(parts, axis=-1)
        return ConvBlock(self.out, 1, fused=self.fused, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 stride-1 maxpools."""
    out: int
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        y = ConvBlock(c, 1, fused=self.fused, name="cv1")(x, train)
        pools = [y]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                     padding=[(2, 2), (2, 2)]))
        y = jnp.concatenate(pools, axis=-1)
        return ConvBlock(self.out, 1, fused=self.fused, name="cv2")(y, train)


class _ConvParams(nn.Module):
    """Declares {kernel, bias} under a child scope named like nn.Conv's, so
    alternate compute paths keep checkpoint-identical pytrees."""
    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class S2DStem(nn.Module):
    """First stem conv over space-to-depth cells (ops.letterbox.letterbox_s2d).

    Bit-identical to ConvBlock(out, 3, 2) on the equivalent image: the
    stride-2 3x3 conv becomes 4 stride-1 cell shifts concatenated into a
    48-dim feature and one matmul — tiny-channel stride-2 convs are the
    detector's hottest spot on TPU (SURVEY of round-1 perf in
    docs/performance.md).  Param layout matches ConvBlock ("conv/kernel"
    (3,3,C,out) + bias), so converted checkpoints load unchanged.
    """
    out: int

    @nn.compact
    def __call__(self, cells, train: bool = False):
        c = cells.shape[-1] // 4
        kernel, bias = _ConvParams((3, 3, c, self.out), name="conv")()
        k4 = jnp.zeros((4, 4, c, self.out), kernel.dtype).at[:3, :3].set(kernel)
        w = k4.reshape(2, 2, 2, 2, c, self.out).transpose(0, 2, 1, 3, 4, 5)
        w = w.reshape(16 * c, self.out).astype(cells.dtype)
        s = cells.shape[-3] - 1          # output spatial size
        views = [cells[..., a:a + s, b:b + s, :]
                 for a in range(2) for b in range(2)]
        xcat = jnp.concatenate(views, axis=-1)            # (..., s, s, 16c)
        y = jnp.einsum("...k,ko->...o", xcat, w,
                       preferred_element_type=jnp.float32) + bias
        return nn.silu(y).astype(cells.dtype)


class S2DStemCell(nn.Module):
    """`S2DStem` emitting 2x2-cell layout directly: (B, 321, 321, 4C) cells
    -> (B, 160, 160, 4*out) canonical cells, same {conv: {kernel, bias}}
    params, same arithmetic.

    The stride-2 stem output pixel (2i+p, 2j+q) reads letterbox cells
    (2i+p+a, 2j+q+b), a,b in {0,1} — so the four output sub-positions of an
    output CELL together read a 3x3 window of input cells: one stride-2
    3x3 cell-space conv with the stem matmul's four (4C -> out) blocks
    embedded per sub-position.  2.25x redundant FLOPs vs the flat stem,
    but it deletes the cellify relayout feeding the b1/b2 cell region,
    which measured 1.0 ms at (8, 320, 320, 32) — the relayout was 4x the
    cost of the region's convs (docs/performance.md round-2)."""
    out: int

    @nn.compact
    def __call__(self, cells, train: bool = False):
        c = cells.shape[-1] // 4
        kernel, bias = _ConvParams((3, 3, c, self.out), name="conv")()
        k4 = jnp.zeros((4, 4, c, self.out), kernel.dtype).at[:3, :3].set(kernel)
        w = k4.reshape(2, 2, 2, 2, c, self.out).transpose(0, 2, 1, 3, 4, 5)
        w = w.reshape(4, 4 * c, self.out)                 # W[a*2+b]
        e = jnp.zeros((3, 3, 4 * c, 4 * self.out), kernel.dtype)
        for p in range(2):
            for q in range(2):
                g = (2 * p + q) * self.out
                for a in range(2):
                    for b in range(2):
                        e = e.at[p + a, q + b, :, g:g + self.out] \
                             .add(w[a * 2 + b])
        y = jax.lax.conv_general_dilated(
            cells, e.astype(cells.dtype), (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + jnp.tile(bias, 4)
        return nn.silu(y).astype(cells.dtype)


class _ConvBlockParams(nn.Module):
    """{conv: {kernel, bias}} shell matching ConvBlock's fused param tree."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, name="conv")()


class _BottleneckParams(nn.Module):
    """Param shells matching Bottleneck's fused tree (cv1/conv, cv2/conv)."""
    c: int

    @nn.compact
    def __call__(self):
        k1, b1 = _ConvBlockParams((3, 3, self.c, self.c), name="cv1")()
        k2, b2 = _ConvBlockParams((3, 3, self.c, self.c), name="cv2")()
        return k1, b1, k2, b2


class CellConvBlock(nn.Module):
    """ConvBlock computed in 2x2-cell layout (ops/cellconv.py): same
    arithmetic, same {conv: {kernel, bias}} params, ~5x faster at C<=64
    where flat convs waste MXU lanes (measured, docs/performance.md)."""
    out: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, cells, train: bool = False):
        from yolov8_vit_tpu.ops import cellconv as cc
        cin = cells.shape[-1] // 4
        kernel, bias = _ConvParams((self.k, self.k, cin, self.out),
                                   name="conv")()
        e = cc.embed_kernel(kernel, self.s)
        y = cc.cell_conv(cells, e, jnp.tile(bias, 4), self.s)
        return nn.silu(y)


class CellC2f(nn.Module):
    """C2f computed in 2x2-cell layout.  Param tree identical to fused C2f
    (cv1/m{i}/cv2); the flat channel split/concat become weight-column and
    weight-row permutations (free — constant reindexing of the 1x1 kernels,
    ops/cellconv.py::cell_lane_order)."""
    out: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, cells, train: bool = False):
        from yolov8_vit_tpu.ops import cellconv as cc
        c = int(self.out * self.e)
        cin = cells.shape[-1] // 4
        k1, b1 = _ConvBlockParams((1, 1, cin, 2 * c), name="cv1")()
        split_order = cc.cell_lane_order([c, c])
        e1 = cc.embed_kernel_1x1(k1, out_order=split_order)
        y = cc.cell_conv(cells, e1, jnp.tile(b1, 4)[split_order], 1, pad=0)
        y = nn.silu(y)
        parts = [y[..., :4 * c], y[..., 4 * c:]]
        for i in range(self.n):
            bk1, bb1, bk2, bb2 = _BottleneckParams(c, name=f"m{i}")()
            h = cc.cell_conv(parts[-1], cc.embed_kernel(bk1, 1),
                             jnp.tile(bb1, 4), 1)
            h = nn.silu(h)
            h = cc.cell_conv(h, cc.embed_kernel(bk2, 1),
                             jnp.tile(bb2, 4), 1)
            h = nn.silu(h)
            if self.shortcut:
                h = parts[-1] + h
            parts.append(h)
        ycat = jnp.concatenate(parts, axis=-1)
        k2, b2 = _ConvBlockParams((1, 1, (2 + self.n) * c, self.out),
                                  name="cv2")()
        e2 = cc.embed_kernel_1x1(k2)
        e2 = e2[:, :, cc.cell_input_perm([c] * (2 + self.n)), :]
        y = cc.cell_conv(ycat, e2, jnp.tile(b2, 4), 1, pad=0)
        return nn.silu(y)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (PAN neck top-down path)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class DetectHead(nn.Module):
    """Decoupled anchor-free head: box-DFL branch + cls branch per level.

    Output-conv biases use the ultralytics `bias_init` priors (box 1.0;
    cls log(5/nc/(640/stride)^2)): without them, early training can
    collapse — all class logits drive negative, sigmoid underflows to
    exactly 0 in f32, the task-aligned metric (score^0.5 * IoU^6) hits
    exact 0 for every anchor, the foreground set empties, and the loss
    degenerates to pushing logits further down (observed).
    """
    spec: YOLOv8Spec
    in_channels: Sequence[int]
    fused: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        import math
        s = self.spec
        c2 = max(16, self.in_channels[0] // 4, s.reg_max * 4)
        c3 = max(self.in_channels[0], min(s.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            stride = s.strides[i]
            cls_prior = math.log(5.0 / s.num_classes / (640.0 / stride) ** 2)
            if self.fused:
                # the two branch-entry convs share the input: run them as
                # ONE conv on trace-time-concatenated weights (identical
                # products per output channel; the box branch's N=c2 alone
                # wastes MXU lanes — merged 0.155 -> 0.091 ms at P3)
                kb, bb = _ConvBlockParams((3, 3, f.shape[-1], c2),
                                          name=f"box{i}_0")()
                kc, bc = _ConvBlockParams((3, 3, f.shape[-1], c3),
                                          name=f"cls{i}_0")()
                y = nn.silu(jax.lax.conv_general_dilated(
                    f, jnp.concatenate([kb, kc], -1).astype(f.dtype),
                    (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                    + jnp.concatenate([bb, bc])).astype(f.dtype)
                b, c = y[..., :c2], y[..., c2:]
            else:
                b = ConvBlock(c2, 3, fused=False,
                              name=f"box{i}_0")(f, train)
                c = ConvBlock(c3, 3, fused=False,
                              name=f"cls{i}_0")(f, train)
            b = ConvBlock(c2, 3, fused=self.fused, name=f"box{i}_1")(b, train)
            b = nn.Conv(4 * s.reg_max, (1, 1),
                        bias_init=nn.initializers.constant(1.0),
                        name=f"box{i}_2")(b)
            c = ConvBlock(c3, 3, fused=self.fused, name=f"cls{i}_1")(c, train)
            c = nn.Conv(s.num_classes, (1, 1),
                        bias_init=nn.initializers.constant(cls_prior),
                        name=f"cls{i}_2")(c)
            outs.append((b, c))
        return outs


class YOLOv8(nn.Module):
    """Backbone + PAN neck + detect head.

    __call__ returns per-level (box_dist (B,H,W,4*reg_max),
    cls_logits (B,H,W,nc)) tuples — raw head outputs, shared by the training
    loss and the inference decode (`decode_predictions` in
    yolov8_vit_tpu/runtime/detector.py composes DFL + sigmoid + NMS).
    """
    spec: YOLOv8Spec
    fused: bool = True
    # stem_s2d: input is letterbox_s2d cells (B, S/2+1, S/2+1, 4C) instead of
    # the image; b0 computes via S2DStem (same params, bit-identical, faster)
    stem_s2d: bool = False
    # cell_region: run b1+b2 (the small-channel region where flat convs use
    # a quarter of the MXU) in 2x2-cell layout — same params, same
    # arithmetic, ~2 ms faster at 640/batch-8 (ops/cellconv.py)
    cell_region: bool = False
    # "b2" decellifies after b2 (the shipping config); "b4" keeps b3+b4 in
    # cell layout too — b4's bottleneck convs are C=64 at 80², the same
    # lane-starved case the cell trick targets (A/B knob)
    cell_extent: str = "b2"

    @nn.compact
    def __call__(self, img, train: bool = False):
        s, fused = self.spec, self.fused

        def conv(c, k, st, name):
            return ConvBlock(_ch(c, s), k, st, fused=fused, name=name)

        def c2f(c, n, sc, name):
            return C2f(_ch(c, s), _n(n, s), sc, fused=fused, name=name)

        if self.cell_region:
            # b0 emits cell layout directly — the separate cellify relayout
            # between a flat stem and the cell region measured 1.0 ms at
            # (8, 320, 320, 32), 4x the region's conv time
            assert fused, "cell region is an inference-path (fused) feature"
            assert self.stem_s2d, "cell region requires the s2d letterbox"
            from yolov8_vit_tpu.ops.cellconv import decellify
            xc = S2DStemCell(_ch(64, s), name="b0")(img, train)
            xc = CellConvBlock(_ch(128, s), 3, 2, name="b1")(xc, train)
            xc = CellC2f(_ch(128, s), _n(3, s), True, name="b2")(xc, train)
            if self.cell_extent == "b4":
                xc = CellConvBlock(_ch(256, s), 3, 2, name="b3")(xc, train)
                xc = CellC2f(_ch(256, s), _n(6, s), True, name="b4")(xc,
                                                                     train)
                p3 = decellify(xc)
            else:
                x = decellify(xc)
        elif self.stem_s2d:
            assert fused, "s2d stem is an inference-path (fused) feature"
            x = S2DStem(_ch(64, s), name="b0")(img, train)   # P1
            x = conv(128, 3, 2, "b1")(x, train)              # P2
            x = c2f(128, 3, True, "b2")(x, train)
        else:
            x = conv(64, 3, 2, "b0")(img, train)             # P1
            x = conv(128, 3, 2, "b1")(x, train)              # P2
            x = c2f(128, 3, True, "b2")(x, train)
        if not (self.cell_region and self.cell_extent == "b4"):
            x = conv(256, 3, 2, "b3")(x, train)              # P3
            p3 = c2f(256, 6, True, "b4")(x, train)
        x = conv(512, 3, 2, "b5")(p3, train)                 # P4
        p4 = c2f(512, 6, True, "b6")(x, train)
        x = conv(1024, 3, 2, "b7")(p4, train)                # P5
        x = c2f(1024, 3, True, "b8")(x, train)
        p5 = SPPF(_ch(1024, s), fused=fused, name="b9")(x, train)

        # PAN neck: top-down
        x = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        n4 = c2f(512, 3, False, "n12")(x, train)
        x = jnp.concatenate([_upsample2x(n4), p3], axis=-1)
        n3 = c2f(256, 3, False, "n15")(x, train)             # P3 out
        # bottom-up
        x = conv(256, 3, 2, "n16")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        o4 = c2f(512, 3, False, "n18")(x, train)             # P4 out
        x = conv(512, 3, 2, "n19")(o4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        o5 = c2f(1024, 3, False, "n21")(x, train)            # P5 out

        head_in = [_ch(256, s), _ch(512, s), _ch(1024, s)]
        return DetectHead(s, head_in, fused=fused,
                          name="detect")([n3, o4, o5], train)


def flatten_head_outputs(outs):
    """Per-level NHWC head maps -> (B, A, 4*reg_max), (B, A, nc).

    Anchor order matches `make_anchors`: level-major, row-major, x fastest.
    """
    box, cls = [], []
    for b, c in outs:
        bs = b.shape[0]
        box.append(b.reshape(bs, -1, b.shape[-1]))
        cls.append(c.reshape(bs, -1, c.shape[-1]))
    return jnp.concatenate(box, axis=1), jnp.concatenate(cls, axis=1)
