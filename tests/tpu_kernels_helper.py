"""Subprocess helper for test_tpu_kernels.py::test_pallas_kernels_on_hardware.

Runs OUTSIDE the CPU-pinned pytest process, on the axon (TPU) platform.
Every Pallas kernel the production two-stage pipeline dispatches is executed
COMPILED on the real chip at production shapes and compared against a
reference computed on the same device (interpret mode or the plain XLA
formulation).  This exists because Mosaic bugs can be hardware-only: a
round-1 block-diagonal SDPA packing corrupted data on the chip while
interpret mode was clean (docs/performance.md round-2 dead ends) — without
this gate, such a regression would pass the whole CPU suite.

Prints KERNELS_MATCH on success.  Usage: python tests/tpu_kernels_helper.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name: str, got, want, tol: float) -> bool:
    import jax.numpy as jnp
    g = jnp.asarray(got, jnp.float32)
    w = jnp.asarray(want, jnp.float32)
    err = float(jnp.max(jnp.abs(g - w)))
    ref = max(float(jnp.max(jnp.abs(w))), 1e-6)
    ok = err <= tol * ref
    print(f"{name}: max_abs_err {err:.3e} (ref mag {ref:.3e}, "
          f"rel {err / ref:.3e}) {'ok' if ok else 'FAIL'}", flush=True)
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    assert jax.default_backend() != "cpu", "helper must run on the TPU"

    from yolov8_vit_tpu.ops.attention import (fused_attention_block,
                                              fused_attention_block_i8)
    from yolov8_vit_tpu.ops.quant import (quantize_weight, quant_dense_pre,
                                          quant_mlp_ln_fused)
    from yolov8_vit_tpu.ops.nms import area_sorted_nms, efficient_nms_scan
    from masked_nms_oracle import efficient_nms

    rng = np.random.default_rng(0)
    ok = True
    b, t, d, heads, hid = 4, 197, 768, 12, 3072  # production ViT-B/16 shapes
    f32 = jnp.float32

    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.bfloat16)
    lns = jnp.asarray(1 + 0.1 * rng.normal(size=d), f32)
    lnb = jnp.asarray(0.01 * rng.normal(size=d), f32)
    wq = jnp.asarray(rng.normal(0, 0.02, (d, 3 * d)), f32)
    bq = jnp.asarray(0.01 * rng.normal(size=3 * d), f32)
    wp = jnp.asarray(rng.normal(0, 0.02, (d, d)), f32)
    bp = jnp.asarray(0.01 * rng.normal(size=d), f32)

    # 1. bf16 fused attention block: compiled Mosaic vs interpret mode,
    #    both on this device (identical arithmetic; tolerance covers
    #    instruction-level rounding differences only)
    hw = jax.jit(lambda x: fused_attention_block(
        x, lns, lnb, wq, bq, wp, bp, heads=heads, interpret=False))(x)
    it = jax.jit(lambda x: fused_attention_block(
        x, lns, lnb, wq, bq, wp, bp, heads=heads, interpret=True))(x)
    ok &= check("fused_attention_block hw-vs-interpret", hw, it, 2e-2)

    # 2. int8 attention block (the production quant='w8a' kernel)
    kqi, sq = quantize_weight(wq)
    kpi, sp = quantize_weight(wp)
    hw = jax.jit(lambda x: fused_attention_block_i8(
        x, lns, lnb, kqi, sq, bq, kpi, sp, bp, heads=heads,
        interpret=False))(x)
    it = jax.jit(lambda x: fused_attention_block_i8(
        x, lns, lnb, kqi, sq, bq, kpi, sp, bp, heads=heads,
        interpret=True))(x)
    ok &= check("fused_attention_block_i8 hw-vs-interpret", hw, it, 2e-2)

    # 3. int8 MLP+LN kernel vs the unfused XLA int8 formulation (same
    #    quantization math through quant_dense_pre; gelu approximations
    #    differ tanh-vs-erf below quantization noise)
    w1 = jnp.asarray(rng.normal(0, 0.02, (d, hid)), f32)
    b1 = jnp.asarray(0.01 * rng.normal(size=hid), f32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (hid, d)), f32)
    b2 = jnp.asarray(0.01 * rng.normal(size=d), f32)
    k1, s1 = quantize_weight(w1)
    k2, s2 = quantize_weight(w2)
    hw = jax.jit(lambda x: quant_mlp_ln_fused(
        x, lns, lnb, k1, s1, b1, k2, s2, b2, interpret=False))(x)

    def xla_ref(xx):
        xx = xx.astype(f32)
        mu = jnp.mean(xx, -1, keepdims=True)
        xc = xx - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        h = xc * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        a = quant_dense_pre(h, k1, s1, b1)
        a = jax.nn.gelu(a, approximate=True)
        y = quant_dense_pre(a, k2, s2, b2)
        return xx + y

    ok &= check("quant_mlp_ln_fused hw-vs-xla", hw,
                jax.jit(xla_ref)(x), 2e-2)

    # 4. scan NMS kernels vs their non-Pallas formulations, both compiled
    #    on this device, kept sets EXACT (scores distinct => no ties)
    n = 512
    boxes = rng.uniform(0, 600, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(8, 120, (n, 2))
    scores = np.linspace(0.9, 1e-3, n).astype(np.float32)
    rng.shuffle(scores)
    cls = np.zeros((n, 5), np.float32)
    cls[np.arange(n), rng.integers(0, 5, n)] = scores
    jb, jc = jnp.asarray(boxes), jnp.asarray(cls)

    nd_m, bx_m, sc_m, lb_m = jax.jit(
        lambda b, c: efficient_nms(b, c, pre_topk=n))(jb, jc)
    nd_s, bx_s, sc_s, lb_s = jax.jit(
        lambda b, c: efficient_nms_scan(b, c, interpret=False))(jb, jc)
    same = (int(nd_m) == int(nd_s)
            and bool(jnp.all(lb_m == lb_s))
            and bool(jnp.all(jnp.abs(bx_m - bx_s) < 1e-3))
            and bool(jnp.all(jnp.abs(sc_m - sc_s) < 1e-5)))
    print(f"efficient_nms scan-vs-masked on hw: num {int(nd_m)}=="
          f"{int(nd_s)} exact={same}", flush=True)
    ok &= same

    valid = jnp.asarray(scores > 0.05)
    k_scan = jax.jit(lambda b, s, v: area_sorted_nms(
        b, s, v, impl="scan", interpret=False))(jb, jnp.asarray(scores),
                                                valid)
    k_sort = jax.jit(lambda b, s, v: area_sorted_nms(
        b, s, v, impl="argsort"))(jb, jnp.asarray(scores), valid)
    same = bool(jnp.all(k_scan == k_sort))
    print(f"area_sorted_nms scan-vs-argsort on hw: kept "
          f"{int(jnp.sum(k_scan))} exact={same}", flush=True)
    ok &= same

    # 5. FULL two-stage pipeline (tiny config) compiled on the chip vs the
    #    SAME graph on the in-process CPU backend: end-to-end hardware
    #    numerics across letterbox, detector, decode, both NMS kernels,
    #    crop compaction, and the classifier
    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec

    # near-zero thresholds: random-init logits sit at the head's class
    # priors (~1e-2 sigmoid), so production thresholds would keep nothing
    # and the comparison would be trivially equal
    pipe = TwoStagePipeline(
        det_cfg=DetectConfig(input_size=(64, 64), variant="n",
                             nms_pre_topk=64, nms_topk=16,
                             nms_conf=1e-3, conf_second=1e-3),
        vit_spec=ViTSpec(img_size=32, patch=8, dim=64, depth=2, heads=4,
                         backbone_classes=40),
        classify_budget=2, dtype=jnp.float32)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 80, 3), dtype=np.uint8))
    tpu_out = jax.tree.map(np.asarray, jax.jit(pipe.__call__)(params, imgs))
    # the kernels pick interpret mode from jax.default_backend(), which is
    # "tpu" in this process — patch it for the CPU-reference trace so the
    # Pallas calls lower as interpreted ops there
    from unittest import mock
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        cpu_out = jax.tree.map(np.asarray, jax.jit(
            pipe.__call__, backend="cpu")(
                jax.device_put(params, jax.devices("cpu")[0]),
                jax.device_put(imgs, jax.devices("cpu")[0])))
    same = (np.array_equal(tpu_out["num_dets"], cpu_out["num_dets"])
            and np.array_equal(tpu_out["det_labels"], cpu_out["det_labels"])
            and np.array_equal(tpu_out["final_valid"],
                               cpu_out["final_valid"])
            and np.allclose(tpu_out["boxes"], cpu_out["boxes"],
                            rtol=1e-3, atol=1e-2))
    print(f"two_stage tpu-vs-cpu: num={tpu_out['num_dets'].tolist()} "
          f"exact_kept={same}", flush=True)
    ok &= same

    if ok:
        print("KERNELS_MATCH")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
