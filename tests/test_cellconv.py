"""Cell-layout conv formulation (ops/cellconv.py): exactness vs flat convs.

The cell region re-parameterizes the detector's small-channel convs into
2x2-cell-layout convs with embedded kernels (structural zeros).  The
products are identical; only f32 accumulation order changes, so f32
agreement is asserted at ~1e-5 and the detector-level test pins the
fused-path parity the bench relies on.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov8_vit_tpu.ops.cellconv import (
    cellify, decellify, embed_kernel, embed_kernel_1x1, cell_lane_order,
    cell_input_perm, cell_conv,
)


def _conv(x, w, b, stride, pad=None):
    p = w.shape[0] // 2 if pad is None else pad
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def test_cellify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    assert jnp.array_equal(decellify(cellify(x)), x)
    # sub-position-major lane semantics
    c = cellify(x)
    assert jnp.array_equal(c[0, 1, 2, 5:10], x[0, 2, 5])      # (p,q)=(0,1)
    assert jnp.array_equal(c[0, 1, 2, 15:20], x[0, 3, 5])     # (p,q)=(1,1)


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 1)])
def test_embed_kernel_matches_flat(stride, k):
    rng = np.random.default_rng(1)
    cin, cout = 6, 10
    x = jnp.asarray(rng.standard_normal((2, 16, 20, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    flat = _conv(x, w, b, stride)
    if k == 1:
        e = embed_kernel_1x1(w)
        cell = cell_conv(cellify(x), e, jnp.tile(b, 4), stride, pad=0)
    else:
        e = embed_kernel(w, stride)
        cell = cell_conv(cellify(x), e, jnp.tile(b, 4), stride)
    np.testing.assert_allclose(decellify(cell), flat, rtol=2e-5, atol=2e-5)


def test_embed_1x1_out_order_makes_split_contiguous():
    rng = np.random.default_rng(2)
    cin, c = 8, 3                                  # cv1: cin -> 2c
    x = jnp.asarray(rng.standard_normal((1, 8, 8, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, cin, 2 * c)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2 * c,)), jnp.float32)
    flat = _conv(x, w, b, 1)
    order = cell_lane_order([c, c])
    e = embed_kernel_1x1(w, out_order=order)
    cell = cell_conv(cellify(x), e, jnp.tile(b, 4)[order], 1, pad=0)
    y1, y2 = cell[..., :4 * c], cell[..., 4 * c:]
    np.testing.assert_allclose(decellify(y1), flat[..., :c], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(decellify(y2), flat[..., c:], rtol=1e-5,
                               atol=1e-5)


def test_cell_input_perm_matches_concat():
    """Row-permuted 1x1 kernel consumes part-major concatenated cell
    tensors exactly like the flat conv consumes the flat concat."""
    rng = np.random.default_rng(3)
    c = 4
    xs = [jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
          for _ in range(3)]
    w = jnp.asarray(rng.standard_normal((1, 1, 3 * c, 7)), jnp.float32)
    b = jnp.zeros((7,), jnp.float32)
    flat = _conv(jnp.concatenate(xs, axis=-1), w, b, 1)
    cat_cells = jnp.concatenate([cellify(x) for x in xs], axis=-1)
    e = embed_kernel_1x1(w)[:, :, cell_input_perm([c] * 3), :]
    cell = cell_conv(cat_cells, e, jnp.tile(b, 4), 1, pad=0)
    np.testing.assert_allclose(decellify(cell), flat, rtol=1e-5, atol=1e-5)


def test_yolov8_cell_region_matches_s2d():
    """Full detector: cell_region=True output == stem_s2d output (f32),
    loading the SAME param tree (layout identity is part of the contract)."""
    import dataclasses
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=5)
    rng = np.random.default_rng(4)
    cells = jnp.asarray(rng.standard_normal((1, 33, 33, 12)), jnp.float32)

    m_ref = YOLOv8(spec, fused=True, stem_s2d=True)
    m_cell = YOLOv8(spec, fused=True, stem_s2d=True, cell_region=True)
    params = m_ref.init(jax.random.PRNGKey(0), cells)
    p_cell = m_cell.init(jax.random.PRNGKey(0), cells)
    assert (jax.tree.structure(params) == jax.tree.structure(p_cell))
    for (ka, a), (kb, bb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p_cell)):
        assert ka == kb and a.shape == bb.shape, (ka, a.shape, bb.shape)

    out_ref = m_ref.apply(params, cells)
    out_cell = m_cell.apply(params, cells)
    for (br, cr), (bc, cc2) in zip(out_ref, out_cell):
        np.testing.assert_allclose(bc, br, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(cc2, cr, rtol=1e-4, atol=1e-4)


def test_two_stage_cell_mode_matches_s2d():
    """Pipeline-level: stem_mode='cell' and 's2d' agree on boxes/labels."""
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    det_cfg = DetectConfig(input_size=(64, 64), variant="n",
                           nms_pre_topk=64, nms_topk=16)
    vs = ViTSpec(img_size=32, patch=8, dim=64, depth=1, heads=4,
                 backbone_classes=16)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 80, 3), dtype=np.uint8))
    pipes = {m: TwoStagePipeline(det_cfg=det_cfg, vit_spec=vs,
                                 classify_budget=2, stem_mode=m)
             for m in ("s2d", "cell")}
    params = jax.jit(pipes["s2d"].init_params)(jax.random.PRNGKey(1))
    outs = {m: p(params, imgs) for m, p in pipes.items()}
    np.testing.assert_allclose(outs["cell"]["boxes"], outs["s2d"]["boxes"],
                               rtol=1e-4, atol=1e-3)
    assert jnp.array_equal(outs["cell"]["det_labels"],
                           outs["s2d"]["det_labels"])
    assert jnp.array_equal(outs["cell"]["final_valid"],
                           outs["s2d"]["final_valid"])
    assert jnp.array_equal(outs["cell"]["cls_labels"],
                           outs["s2d"]["cls_labels"])


def test_s2d_stem_cell_matches_cellified_flat_stem():
    """S2DStemCell(cells) == cellify(S2DStem(cells)) on the same params."""
    from yolov8_vit_tpu.models.yolov8 import S2DStem, S2DStemCell
    rng = np.random.default_rng(7)
    cells = jnp.asarray(rng.normal(size=(2, 17, 17, 12)), jnp.float32)
    flat = S2DStem(8)
    p = flat.init(jax.random.PRNGKey(0), cells)
    ref = cellify(flat.apply(p, cells))
    got = S2DStemCell(8).apply(p, cells)
    assert got.shape == ref.shape == (2, 8, 8, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_yolov8_cell_extent_b4_matches_b2():
    """cell_extent="b4" (b3+b4 in cell layout) == the default "b2" path,
    same param tree.  Measured SLOWER on hardware (the 4x embedded-kernel
    FLOP redundancy on b3/b4's 128-256-lane convs outweighs the C=64
    bottleneck wins at 80² — docs/performance.md round 3), kept as a
    numerically-pinned A/B knob."""
    import dataclasses
    from yolov8_vit_tpu.models.yolov8 import YOLOv8, YOLOV8_VARIANTS
    spec = dataclasses.replace(YOLOV8_VARIANTS["n"], num_classes=5)
    rng = np.random.default_rng(5)
    cells = jnp.asarray(rng.standard_normal((1, 33, 33, 12)), jnp.float32)
    m_b2 = YOLOv8(spec, fused=True, stem_s2d=True, cell_region=True)
    m_b4 = YOLOv8(spec, fused=True, stem_s2d=True, cell_region=True,
                  cell_extent="b4")
    params = m_b2.init(jax.random.PRNGKey(0), cells)
    p4 = m_b4.init(jax.random.PRNGKey(0), cells)
    assert jax.tree.structure(params) == jax.tree.structure(p4)
    out_b2 = m_b2.apply(params, cells)
    out_b4 = m_b4.apply(params, cells)
    for (br, cr), (bc, cc2) in zip(out_b2, out_b4):
        np.testing.assert_allclose(bc, br, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(cc2, cr, rtol=1e-4, atol=1e-4)
