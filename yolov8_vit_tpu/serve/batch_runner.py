"""Production batch inference: native host decode + fused device pipeline.

The reference's hot path is a per-image Python loop with per-crop bs=1 ViT
forwards (SURVEY.md §3.1 "hot loops").  This runner is the TPU-shaped
replacement for camera/stream workloads:

  * images decode on host threads via the native C++ pipeline (csrc/), with
    a PIL fallback;
  * frames are BUCKETED BY RESOLUTION: the fused two-stage graph has static
    shapes, so each distinct (H, W) compiles once (persistent cache) and
    every subsequent frame of that size rides the same executable — the XLA
    analogue of a TensorRT engine profile;
  * each bucket executes detect->NMS->crop->classify as one device program
    (models/two_stage.py) and results map back to input order.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from yolov8_vit_tpu.config import CLASS_NAMES, DetectConfig
from yolov8_vit_tpu.models.two_stage import TwoStagePipeline


@dataclasses.dataclass
class BatchRunner:
    pipeline: TwoStagePipeline
    params: dict
    max_batch: int = 8

    def __post_init__(self):
        # pack all outputs into ONE f32 array so fetching results costs a
        # single device->host transfer (over tunneled transports each fetch
        # pays a full round trip; 7 fetches made serving latency-bound)
        def packed(params, images):
            o = self.pipeline(params, images)
            b = images.shape[0]
            return jnp.concatenate([
                o["num_dets"].reshape(b, 1).astype(jnp.float32),
                o["boxes"].reshape(b, -1),
                o["det_scores"],
                o["det_labels"].astype(jnp.float32),
                o["final_valid"].astype(jnp.float32),
                o["cls_labels"].astype(jnp.float32),
                o["cls_scores"],
            ], axis=1)

        self._fn = jax.jit(packed)

    def _unpack(self, arr: np.ndarray) -> list[dict]:
        t = self.pipeline.det_cfg.nms_topk
        out = []
        for row in arr:
            i = 0

            def take(n):
                nonlocal i
                v = row[i:i + n]
                i += n
                return v

            out.append({
                "num_dets": int(take(1)[0]),
                "boxes": take(4 * t).reshape(t, 4),
                "det_scores": take(t),
                "det_labels": take(t).astype(np.int32),
                "final_valid": take(t).astype(bool),
                "cls_labels": take(t).astype(np.int32),
                "cls_scores": take(t),
            })
        return out

    # ------------------------------------------------------------------
    def _decode(self, path: str):
        try:
            from yolov8_vit_tpu.runtime.native import decode_image
            img = decode_image(path)
            if img is not None:
                return img
        except Exception:  # noqa: BLE001 — fall through to PIL
            pass
        from PIL import Image
        try:
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"))
        except OSError:
            return None

    def run_paths(self, paths: Sequence[str],
                  profile: dict | None = None) -> list[dict | None]:
        """Decode + run; returns one result dict per input path (None when
        the image failed to decode), in input order.

        Pipelined: images decode on a thread pool, every chunk is ENQUEUED
        to the device before any result is fetched (dispatch is async), and
        the packed single-array results are materialized last — so host
        decode, device compute, and result transfer all overlap.

        `profile`, when given, accumulates wall-clock buckets (ms):
        decode_ms (host JPEG/PNG -> RGB), enqueue_ms (host->device upload +
        dispatch), fetch_ms (device compute + result download, overlapped
        with nothing left to hide it)."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(min(8, max(len(paths), 1))) as pool:
            imgs = list(pool.map(self._decode, paths))
        t1 = time.perf_counter()
        results: list[dict | None] = [None] * len(paths)
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for i, img in enumerate(imgs):
            if img is not None:
                buckets[img.shape[:2]].append(i)
        pending = []   # (chunk indices, device array)
        for _hw, idxs in buckets.items():
            for start in range(0, len(idxs), self.max_batch):
                chunk = idxs[start:start + self.max_batch]
                batch = np.stack([imgs[i] for i in chunk])
                if len(chunk) < self.max_batch:
                    # pad the tail chunk to the full batch so each distinct
                    # (H, W) compiles ONE executable — a fresh compile per
                    # remainder size would stall serving requests (the
                    # padded rows are sliced off in _unpack below)
                    pad = self.max_batch - len(chunk)
                    batch = np.concatenate(
                        [batch, np.zeros((pad, *batch.shape[1:]),
                                         batch.dtype)])
                pending.append((chunk, self._fn(self.params,
                                                jnp.asarray(batch))))
        t2 = time.perf_counter()
        for chunk, dev in pending:
            packed = np.asarray(dev)
            # zip drops the padded tail rows (chunk is the source of truth)
            for idx, rec in zip(chunk, self._unpack(packed)):
                results[idx] = rec
        t3 = time.perf_counter()
        if profile is not None:
            profile["decode_ms"] = profile.get("decode_ms", 0.0) + \
                (t1 - t0) * 1e3
            profile["enqueue_ms"] = profile.get("enqueue_ms", 0.0) + \
                (t2 - t1) * 1e3
            profile["fetch_ms"] = profile.get("fetch_ms", 0.0) + \
                (t3 - t2) * 1e3
        return results

    # ------------------------------------------------------------------
    def flatten(self, paths: Sequence[str],
                results: Sequence[dict | None]) -> list[tuple]:
        """inferdet-parity flattened tuples
        (img, cls_id, conf, x1, y1, x2, y2), sorted by image name."""
        import os
        rows = []
        for path, res in zip(paths, results):
            if res is None:
                continue
            name = os.path.basename(path)
            valid = res["final_valid"]
            for k in np.nonzero(valid)[0]:
                cls = int(res["cls_labels"][k])
                if cls < 0:  # not classified (over budget): stage-1 label
                    cls = int(res["det_labels"][k])
                box = res["boxes"][k]
                rows.append((name, cls, float(res["det_scores"][k]),
                             int(box[0]), int(box[1]), int(box[2]),
                             int(box[3])))
        rows.sort(key=lambda r: r[0])
        return rows

    def to_objects(self, result: dict) -> list[dict]:
        """One result dict -> VOC-style objects list (for annotation/draw)."""
        objs = []
        for k in np.nonzero(result["final_valid"])[0]:
            cls = int(result["cls_labels"][k])
            if cls < 0:
                cls = int(result["det_labels"][k])
            box = result["boxes"][k]
            objs.append({"sort": CLASS_NAMES[cls],
                         "xmin": int(box[0]), "ymin": int(box[1]),
                         "xmax": int(box[2]), "ymax": int(box[3])})
        return objs


def make_runner(det_engine_path: str | None = None,
                vit_engine_path: str | None = None,
                det_cfg: DetectConfig = DetectConfig(),
                classify_budget: int = 4, dtype=jnp.bfloat16,
                rng_seed: int = 0) -> BatchRunner:
    """Build a BatchRunner from engine dirs (random params when absent)."""
    import dataclasses as _dc
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.engine import Engine

    vit_spec = ViTSpec()
    det_params = vit_params = None
    if det_engine_path:
        eng = Engine(det_engine_path)
        det_cfg = eng.det_cfg
        det_params = eng.params
    if vit_engine_path:
        ceng = Engine(vit_engine_path)
        vit_spec = ceng.vit_spec
        vit_params = ceng.params
    # attn_impl is a runtime choice, not a weight property: serving always
    # takes the fused-attention kernel (argmax-stable vs the module path,
    # tests/test_fused_attention.py)
    vit_spec = _dc.replace(vit_spec, attn_impl="fused")

    pipe = TwoStagePipeline(det_cfg=det_cfg, vit_spec=vit_spec,
                            classify_budget=classify_budget, dtype=dtype)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(rng_seed))
    if det_params is not None:
        params["det"] = det_params
    if vit_params is not None:
        params["vit"] = vit_params
    return BatchRunner(pipe, params)
