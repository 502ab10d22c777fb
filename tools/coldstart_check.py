"""Measure engine cold-start: load -> first result, AOT blob vs traced.

Phases (separate processes):
  --prepare   build a production-shape classify engine (ViT-B/16 w8a) on
              the CPU backend (param init compiles are expensive over the
              tunnel and irrelevant to the artifact)
  --attach    attach an AOT blob for batch 8 on the CURRENT platform (run
              on the TPU; lowering is host-side, no device compiles)
  --attach-compiled
              attach a COMPILED .jaxcomp blob (runs the full XLA compile
              once, on the TPU platform; the deserializeCudaEngine-parity
              artifact — load pays NO re-trace and NO compile)
  --measure [--no-aot]
              time Engine() + first __call__ in THIS fresh process
              (a trivial device op runs first so the tunnel handshake is
              excluded; XLA persistent cache state is whatever is on disk —
              run twice to see cold/warm-cache numbers).  With a .jaxcomp
              present the Engine prefers it (last_path prints which ran);
              --no-aot disables both registries for the traced baseline.

Records for docs/performance.md (VERDICT round-2 item 4 / round-3 item 3
done-gates).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENG = "/tmp/coldstart_engine"


def prepare():
    import dataclasses
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from yolov8_vit_tpu.models.vit import ViTClassifier, ViTSpec
    from yolov8_vit_tpu.ops.quant import (prequantize_tree,
                                          MLP_AND_ATTN_SUFFIXES)
    from yolov8_vit_tpu.runtime.engine import save_engine
    spec = ViTSpec(patch=16)
    model = ViTClassifier(spec, 5)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 224, 224, 3)))
    qspec = dataclasses.replace(spec, quant="w8a", attn_impl="fused")
    qparams = prequantize_tree(params, MLP_AND_ATTN_SUFFIXES)
    save_engine(ENG, "classify", qparams,
                {"vit_spec": dataclasses.asdict(qspec), "num_classes": 5})
    print("engine ->", ENG)


def attach():
    import jax.numpy as jnp
    from yolov8_vit_tpu.runtime.engine import attach_aot
    # bf16: the production serving dtype
    for p in attach_aot(ENG, [(8, 224, 224, 3)], dtype=jnp.bfloat16):
        print("aot ->", p)


def attach_compiled():
    import time as _t
    import jax.numpy as jnp
    from yolov8_vit_tpu.runtime.engine import attach_compiled as ac
    t0 = _t.perf_counter()
    for p in ac(ENG, [(8, 224, 224, 3)], dtype=jnp.bfloat16):
        print(f"compiled -> {p}  ({_t.perf_counter() - t0:.1f}s "
              f"compile+serialize, paid once at export)")


def measure(use_aot: bool):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from yolov8_vit_tpu.utils import enable_compilation_cache
    from yolov8_vit_tpu.utils.profiling import device_barrier
    enable_compilation_cache()
    float(jax.jit(lambda: jnp.zeros(()))())     # handshake, excluded
    x = np.random.default_rng(0).random((8, 224, 224, 3)).astype(np.float32)
    from yolov8_vit_tpu.runtime.engine import Engine
    t0 = time.perf_counter()
    eng = Engine(ENG, dtype=jnp.bfloat16)
    if not use_aot:
        eng._aot = {}
        eng._compiled = {}
    t1 = time.perf_counter()
    out = eng(x)
    device_barrier({"o": out})
    t2 = time.perf_counter()
    print(f"aot={use_aot} path={eng.last_path}: load {t1-t0:.2f}s, "
          f"first result {t2-t1:.2f}s, total {t2-t0:.2f}s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--attach", action="store_true")
    ap.add_argument("--attach-compiled", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--no-aot", action="store_true")
    a = ap.parse_args()
    if a.prepare:
        prepare()
    if a.attach:
        attach()
    if a.attach_compiled:
        attach_compiled()
    if a.measure:
        measure(not a.no_aot)
