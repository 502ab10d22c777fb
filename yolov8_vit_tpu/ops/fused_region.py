"""Fused early-region Pallas kernel (b1+b2 in one launch) — the measured
answer to the ledger's last open perf question, kept as a maintained
artifact, NOT wired into the shipping model.

Context.  The speed-of-light appendix (docs/performance.md, e37-e43) left
one quantified escape hatch in the detector roofline: "up to ~3 ms of
schedule headroom may remain in the early region, reachable only by a
hand-pipelined multi-conv stem kernel" that keeps activations resident in
VMEM.  e47-e58 measured the chip/Pallas envelope; this module is the
kernel itself, built and measured on the v5e (e59a-e59f):

  * b1 alone (stride-2 3x3 cell conv, 160^2x128 -> 80^2x256, batch 32):
    Pallas 2.15 ms vs XLA 2.0-2.7 ms — parity within day noise.
  * b1+b2 fused (adding the full CellC2f: cv1 1x1 -> split -> bottleneck
    (3x3,3x3)+residual -> cv2, all inside the band loop, zero inter-stage
    HBM traffic): Pallas 3.60 ms vs XLA 3.28 ms same-scope.  Numerics:
    max |delta| 0.002 on an output std 0.056 (bf16 reassociation class).

Verdict: the fusion's traffic elimination (~183 MB of inter-stage
round-trips, ~1.3 ms at the Pallas DMA rate) is consumed almost exactly
by the in-kernel cost of b2 (column-shift relayouts, masks, silu
passes, and the stride-2 pairing's 4/3 MAC overhead), leaving the fused
kernel at parity-to-slightly-behind XLA.  The hand-kernel lever is
therefore CLOSED by direct measurement: XLA's schedule of this region is
at its memory floor (e53) and the Pallas route cannot beat it on this
hardware.  Full ledger entry: docs/performance.md "The early-stem
hand-kernel question" sections.

Design notes (what made it correct and as fast as it is):
  * HBM layout: rows padded +5/+5, columns padded +1/+15 and PAIRED into
    lanes (B*(H+10), (H+16)/2, 2C) — a free XLA bitcast-reshape — so the
    stride-2 column taps become two K=2C dots per row-tap ([e_u0; e_u1]
    and [e_u2; 0]) on 8-aligned slices, with no in-kernel relayouts.
  * Row parity via a major-dim reshape of the slab (free), row taps as
    untiled dim-0 slices (free), stride-1 column taps hoisted to three
    sublane shifts per conv stage (the unhoisted per-(u,v) form cost
    +0.8 ms, e59e vs e59f).
  * Manual 2-slot slab DMA (2.25 MB slabs) sustained ~183 GB/s aggregate
    — well above the 48 GB/s that e56b's chained-copy microbenchmark
    suggested for this size class.
  * Out-of-image halo rows must be masked to ZERO after every nonlinear
    stage (silu(bias) != 0); this was the band-boundary bug class that
    sank e55c.

The kernel computes, bit-compatibly with the shipping modules up to bf16
reassociation (~2e-3):

    y = CellConvBlock(c2, 3, 2)(x)        # models/yolov8.py:265
    y = CellC2f(c2, n=1, shortcut=True)(y)  # models/yolov8.py:284

i.e. the backbone's b1+b2 stages in 2x2-cell layout — the same layers the
reference's TRT builder emits back-to-back
(`/root/reference/docs/YOLO_TensorRT_Technical.md:160-221`).

Tested: tests/test_fused_region.py (CPU interpret-mode parity at reduced
dims, multi-seed); full-dim on-chip parity + timing recorded in the
ledger (e59e/e59f outputs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolov8_vit_tpu.ops import cellconv as cc
from yolov8_vit_tpu.ops.lowering import interpret_default

NB = 4          # output bands per image (sequential, in one grid axis)


def _silu_bf16(acc: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """f32 accumulator + bias -> bf16 silu, matching the shipping path
    (cell_conv casts to bf16, then nn.silu; XLA evaluates the bf16
    logistic in f32 internally — Mosaic needs that spelled out, and the
    bf16 logistic also hits a Mosaic verifier bug, e59a)."""
    y = (acc + bias).astype(jnp.bfloat16)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(jnp.bfloat16)


def prep_inputs(x_cells: jnp.ndarray) -> jnp.ndarray:
    """(B, H, H, C) cell tensor -> padded+column-paired HBM layout
    (B*(H+10), (H+16)//2, 2C).  Rows +5/+5 cover the stride-2 taps of the
    first/last band incl. the b2 halo; columns +1/+15 give SAME padding on
    the left and 8-alignment of the pair dim.  The reshape is a free
    bitcast (no data movement) and the pad fuses into the producer."""
    b, h, w, c = x_cells.shape
    xp = jnp.pad(x_cells, ((0, 0), (5, 5), (1, 15), (0, 0)))
    return xp.reshape(b * (h + 10), (w + 16) // 2, 2 * c)


def prep_weights(params: dict) -> tuple:
    """Param dict {b1, cv1, m0_cv1, m0_cv2, cv2} -> the kernel's weight
    operands; each entry holds the flat-conv {conv: {kernel, bias}} shell
    that CellConvBlock/CellC2f store (models/yolov8.py:265-322 — this
    module flattens the C2f's m0/cv1, m0/cv2 nesting to single keys).
    Uses the same cellconv transforms as the XLA path, so numerics agree
    by construction."""
    def kb(name):
        p = params[name]["conv"]
        return p["kernel"], p["bias"]

    k_b1, b_b1 = kb("b1")
    k_cv1, b_cv1 = kb("cv1")
    k_m1, b_m1 = kb("m0_cv1")
    k_m2, b_m2 = kb("m0_cv2")
    k_cv2, b_cv2 = kb("cv2")
    c2 = k_b1.shape[3]
    c = c2 // 2
    so = cc.cell_lane_order([c, c])
    ip = cc.cell_input_perm([c, c, c])

    e = cc.embed_kernel(k_b1, 2)                         # (3,3,4c1,4c2)
    z = jnp.zeros_like(e[0, 0])
    wp = jnp.stack([jnp.stack([jnp.concatenate([e[u, 0], e[u, 1]], 0),
                               jnp.concatenate([e[u, 2], z], 0)], 0)
                    for u in range(3)], 0)               # (3,2,8c1,4c2)
    w1 = cc.embed_kernel_1x1(k_cv1, out_order=so)[0, 0]
    wm1 = cc.embed_kernel(k_m1, 1).reshape(9, 4 * c, 4 * c)
    wm2 = cc.embed_kernel(k_m2, 1).reshape(9, 4 * c, 4 * c)
    w2 = cc.embed_kernel_1x1(k_cv2)[0, 0][ip, :]         # (12c,4c2)
    return (wp, w1, wm1, wm2, w2,
            jnp.tile(b_b1, 4).reshape(1, -1),
            jnp.tile(b_cv1, 4)[so].reshape(1, -1),
            jnp.tile(b_m1, 4).reshape(1, -1),
            jnp.tile(b_m2, 4).reshape(1, -1),
            jnp.tile(b_cv2, 4).reshape(1, -1))


def _kern(xr, wp, w1, wm1, wm2, w2, bb1, bc1, bm1, bm2, bc2, yr,
          slabs, sems, *, bh: int, rows_per_img: int, c2: int):
    w2o = yr.shape[2]                        # out width (W/2)
    bb = pl.program_id(0)
    t = pl.program_id(1)
    idx = bb * NB + t
    slot = jax.lax.rem(idx, 2)
    slab_rows = 2 * bh + 10

    def issue(i, s):
        st = (jax.lax.div(i, NB) * rows_per_img
              + 2 * bh * jax.lax.rem(i, NB))
        return pltpu.make_async_copy(xr.at[pl.ds(st, slab_rows)],
                                     slabs.at[s], sems.at[s])

    @pl.when(idx == 0)
    def _():
        issue(0, 0).start()

    nxt = idx + 1
    @pl.when(nxt < pl.num_programs(0) * NB)
    def _():
        issue(nxt, jax.lax.rem(nxt, 2)).start()

    issue(idx, slot).wait()
    slab = slabs[slot]                       # (2bh+10, P, 2C)
    par = slab.reshape(slab_rows // 2, 2, slab.shape[1], slab.shape[2])
    E, O = par[:, 0], par[:, 1]
    dn = (((2,), (0,)), ((), ()))
    f32 = jnp.float32
    k4 = bh + 4                              # b1 rows incl. b2 halo

    # ---- b1: stride-2 3x3 cell conv, paired-column dots ----
    acc = jnp.zeros((k4, w2o, 4 * c2), f32)
    for u, (src, off) in enumerate(((E, 0), (O, 0), (E, 1))):
        acc = acc + jax.lax.dot_general(src[off:off + k4, 0:w2o], wp[u, 0],
                                        dn, preferred_element_type=f32)
        acc = acc + jax.lax.dot_general(src[off:off + k4, 1:w2o + 1],
                                        wp[u, 1], dn,
                                        preferred_element_type=f32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k4, 1, 1), 0) + (bh * t - 2)
    val = (rows >= 0) & (rows < NB * bh)
    y = jnp.where(val, _silu_bf16(acc, bb1[0]), jnp.bfloat16(0))

    # ---- b2.cv1 (1x1; split lane order baked into w1) ----
    p = jax.lax.dot_general(y, w1[:], dn, preferred_element_type=f32)
    p = jnp.where(val, _silu_bf16(p, bc1[0]), jnp.bfloat16(0))
    p0 = p[:, :, 0:2 * c2]
    p1 = p[:, :, 2 * c2:4 * c2]

    # ---- bottleneck m0: two 3x3 stride-1 cell convs + residual ----
    def conv3(src, w, bias, n, row_base):
        """3x3 stride-1 cell conv of a (n+2)-row buffer -> n rows, with
        the column shifts hoisted (3 relayouts, not 9 — e59f) and halo
        rows masked to zero."""
        zc = jnp.zeros((src.shape[0], 8, src.shape[2]), jnp.bfloat16)
        sp = jnp.concatenate([zc, src, zc], axis=1)
        px = [sp[:, 7:7 + w2o], sp[:, 8:8 + w2o], sp[:, 9:9 + w2o]]
        a = jnp.zeros((n, w2o, src.shape[2]), f32)
        for u in range(3):
            for v in range(3):
                a = a + jax.lax.dot_general(px[v][u:u + n], w[3 * u + v],
                                            dn, preferred_element_type=f32)
        r = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) + row_base
        return jnp.where((r >= 0) & (r < NB * bh),
                         _silu_bf16(a, bias), jnp.bfloat16(0))

    m1 = conv3(p1, wm1, bm1[0], k4 - 2, bh * t - 1)
    m2 = conv3(m1, wm2, bm2[0], k4 - 4, bh * t)
    h = p1[2:2 + bh] + m2

    # ---- b2.cv2 as three split dots (no concat buffer) ----
    w2v = w2[:]
    a3 = jax.lax.dot_general(p0[2:2 + bh], w2v[0:2 * c2], dn,
                             preferred_element_type=f32)
    a3 = a3 + jax.lax.dot_general(p1[2:2 + bh], w2v[2 * c2:4 * c2], dn,
                                  preferred_element_type=f32)
    a3 = a3 + jax.lax.dot_general(h, w2v[4 * c2:6 * c2], dn,
                                  preferred_element_type=f32)
    yr[0] = _silu_bf16(a3, bc2[0])


def fused_b1b2(x_cells: jnp.ndarray, params: dict,
               interpret: bool | None = None) -> jnp.ndarray:
    """b1 (CellConvBlock stride 2) + b2 (CellC2f n=1 shortcut) in one
    Pallas launch.  x_cells (B, H, H, 4*c1) -> (B, H/2, H/2, 4*c2).

    Constraints: H % (2*NB) == 0 and (H/2/NB) % 2 == 0 (band rows), H/2
    a multiple of 8 (sublane alignment).  The deployed shape is H=160,
    c1=32, c2=64 (yolov8s at 640 px)."""
    if interpret is None:
        interpret = interpret_default()
    b, h, _, _ = x_cells.shape
    bh = h // 2 // NB
    ws = prep_weights(params)
    c2 = ws[1].shape[1] // 4
    xp = prep_inputs(x_cells)
    pairs = xp.shape[1]
    cspec = lambda s: pl.BlockSpec(s, lambda b, t: tuple(0 for _ in s),
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(_kern, bh=bh, rows_per_img=h + 10, c2=c2)
    return pl.pallas_call(
        kern,
        grid=(b, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [cspec(w.shape) for w in ws],
        out_specs=pl.BlockSpec((1, bh, h // 2, 4 * c2),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, h // 2, 4 * c2),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, 2 * bh + 10, pairs,
                                    x_cells.shape[3] * 2), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, *ws)


def region_b1b2_reference(x_cells: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Pure-XLA reference: the exact shipping arithmetic of
    CellConvBlock(c2,3,2) + CellC2f(c2,1,True) on a flat param tree
    (models/yolov8.py:265-322 restated functionally for tests)."""
    def kb(name):
        p = params[name]["conv"]
        return p["kernel"], p["bias"]

    def silu(v):
        return v * jax.nn.sigmoid(v)

    k_b1, b_b1 = kb("b1")
    k_cv1, b_cv1 = kb("cv1")
    k_m1, b_m1 = kb("m0_cv1")
    k_m2, b_m2 = kb("m0_cv2")
    k_cv2, b_cv2 = kb("cv2")
    c2 = k_b1.shape[3]
    c = c2 // 2
    so = cc.cell_lane_order([c, c])
    ip = cc.cell_input_perm([c, c, c])
    y = silu(cc.cell_conv(x_cells, cc.embed_kernel(k_b1, 2),
                          jnp.tile(b_b1, 4), 2))
    e1 = cc.embed_kernel_1x1(k_cv1, out_order=so)
    y1 = silu(cc.cell_conv(y, e1, jnp.tile(b_cv1, 4)[so], 1, pad=0))
    p0, p1 = y1[..., :4 * c], y1[..., 4 * c:]
    hh = silu(cc.cell_conv(p1, cc.embed_kernel(k_m1, 1),
                           jnp.tile(b_m1, 4), 1))
    hh = silu(cc.cell_conv(hh, cc.embed_kernel(k_m2, 1),
                           jnp.tile(b_m2, 4), 1))
    hh = p1 + hh
    ycat = jnp.concatenate([p0, p1, hh], -1)
    e2 = cc.embed_kernel_1x1(k_cv2)
    e2 = e2[:, :, ip, :]
    return silu(cc.cell_conv(ycat, e2, jnp.tile(b_cv2, 4), 1, pad=0))
