"""Full-dimension three-way budget-equality gate, ON HARDWARE.

Run by tests/test_batch_runner.py::test_budget_threeway_fulldim_on_hardware
in a subprocess on the real TPU (the in-process suite pins the CPU mesh).

The CPU toy-dim test (test_budget2_matches_budget8_and_host_path) pins the
budget-2 semantics logic; this closes its scale window the way
test_fulldim_parity did for forwards (round-4 VERDICT weak #5): at the
PRODUCTION shapes — yolov8s@640 with the reference NMS protocol
(`/root/reference/test.ipynb` cell 0), ViT-B/16@224 — a dense
content-fitted 640px scene must yield the SAME final detections and class
labels through three independent paths:

  1. budget-2 BatchRunner (fused graph + exact overflow-reclassify ladder
     — the headline operating point, which the scene forces to overflow),
  2. budget-8 BatchRunner (enough slots to never overflow here),
  3. the host orchestrator (serve/infer.py::main over a real detect
     Engine dir + classifier callable — the reference flow that
     classifies every kept box,
     `/root/reference/YOLOTensorRT_yolodet_py_解读.md:94-117`).

f32 + highest matmul precision isolates budget semantics from dtype
effects (the int8 numerics gate at these dims is tests/test_fulldim_int8
/ ledger e40).  Prints THREEWAY_MATCH on success.
"""
import dataclasses
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> None:
    import cv2
    import jax
    import jax.numpy as jnp

    from yolov8_vit_tpu.config import DetectConfig
    from yolov8_vit_tpu.models.two_stage import TwoStagePipeline
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.engine import Engine, save_engine
    from yolov8_vit_tpu.serve.batch_runner import BatchRunner
    from yolov8_vit_tpu.serve.infer import main as infer_main
    from yolov8_vit_tpu.utils import enable_compilation_cache
    from yolov8_vit_tpu.utils.densify import (fit_detect_head,
                                              make_cover_scenes)

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    cfg = DetectConfig()                    # 640x640 yolov8s, ref protocol
    vit = ViTSpec(patch=16)                 # B/16 @ 224
    rng = np.random.default_rng(7)
    t0 = time.time()

    with jax.default_matmul_precision("highest"):
        pipe2 = TwoStagePipeline(det_cfg=cfg, vit_spec=vit,
                                 classify_budget=2)
        params = jax.jit(pipe2.init_params)(jax.random.PRNGKey(0))
        fit_imgs, fit_covers = make_cover_scenes(rng, 8, (640, 640),
                                                 lam=1.5)
        params = fit_detect_head(params, pipe2, fit_imgs, fit_covers)
        print(f"head fitted ({time.time()-t0:.0f}s)", flush=True)

        # denser-than-production scene so budget 2 (8 slots for the
        # 4-frame batch) genuinely overflows; 640x640 frames = identity
        # letterbox, keeping host-path coords directly comparable.  Draw
        # until the Poisson sum clears the slot count with margin.
        while True:
            imgs_np, covers = make_cover_scenes(rng, 4, (640, 640),
                                                lam=3.5, max_covers=5)
            n_covers = sum(len(c) for c in covers)
            if n_covers >= 12:
                break

        tmp = tempfile.mkdtemp(prefix="threeway_")
        paths = []
        for i, img in enumerate(imgs_np):
            p = os.path.join(tmp, f"scene{i}.png")
            cv2.imwrite(p, img[..., ::-1])
            paths.append(p)

        r2 = BatchRunner(pipe2, params, max_batch=4)
        r8 = BatchRunner(dataclasses.replace(pipe2, classify_budget=8),
                         params, max_batch=4)
        prof: dict = {}
        res2 = r2.run_paths(paths, profile=prof)
        print(f"budget-2 ran ({time.time()-t0:.0f}s)", flush=True)
        res8 = r8.run_paths(paths)
        print(f"budget-8 ran ({time.time()-t0:.0f}s)", flush=True)

        total_valid = sum(int(r["final_valid"].sum()) for r in res2)
        assert total_valid > 2 * len(paths), \
            f"scene not dense enough: {total_valid} valid"
        assert prof.get("overflow_ms", 0.0) > 0.0, "budget 2 never overflowed"

        for ra, rb in zip(res2, res8):
            np.testing.assert_array_equal(ra["final_valid"],
                                          rb["final_valid"])
            v = ra["final_valid"]
            assert (ra["cls_labels"][v] >= 0).all()
            np.testing.assert_array_equal(ra["cls_labels"][v],
                                          rb["cls_labels"][v])
            np.testing.assert_allclose(ra["cls_scores"][v],
                                       rb["cls_scores"][v], atol=1e-4)
        print(f"budget-2 == budget-8 over {total_valid} detections",
              flush=True)

        # ---- host path: detect Engine dir + classifier callable --------
        eng_dir = os.path.join(tmp, "det_eng")
        save_engine(eng_dir, "detect",
                    jax.tree.map(np.asarray, params["det"]),
                    {"detect_cfg": dataclasses.asdict(cfg)})
        eng = Engine(eng_dir)
        eng.set_desired(["num_dets", "bboxes", "scores", "labels"])

        def clf(x):      # NCHW [-1,1] -> logits (infer.main's contract)
            return pipe2.classifier.apply(
                params["vit"], jnp.transpose(x, (0, 2, 3, 1)))

        host = infer_main(eng, tmp, model_list=[clf], crop_size=224)
        print(f"host path ran ({time.time()-t0:.0f}s)", flush=True)

        assert len(host) == total_valid, (len(host), total_valid)
        by_img: dict = {}
        for name, cls_id, conf, x1, y1, x2, y2 in host:
            by_img.setdefault(name, []).append((cls_id, x1, y1, x2, y2,
                                                conf))
        for p, r in zip(paths, res2):
            name = os.path.basename(p)
            ours = []
            for k in np.nonzero(r["final_valid"])[0]:
                b = r["boxes"][k]
                ours.append((int(r["cls_labels"][k]), int(b[0]), int(b[1]),
                             int(b[2]), int(b[3]),
                             float(r["det_scores"][k])))
            theirs = list(by_img.get(name, []))
            assert len(ours) == len(theirs), (name, len(ours), len(theirs))
            # globally-nearest pairing (same rationale as the toy test:
            # truncated-int coord sorts can mispair boundary straddlers)
            ranked = sorted(
                (max(abs(x - y) for x, y in zip(a[1:5], b[1:5])), i, j)
                for i, a in enumerate(theirs) for j, b in enumerate(ours)
                if a[0] == b[0])
            used_i, used_j = set(), set()
            pairs = []
            for _, i, j in ranked:
                if i not in used_i and j not in used_j:
                    used_i.add(i)
                    used_j.add(j)
                    pairs.append((theirs[i], ours[j]))
            assert len(pairs) == len(theirs), (name, "unmatched labels")
            for a, b in pairs:
                np.testing.assert_allclose(a[1:5], b[1:5], atol=1)
                np.testing.assert_allclose(a[5], b[5], atol=1e-3)

    print(f"THREEWAY_MATCH ({total_valid} detections, "
          f"{n_covers} planted covers, {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
