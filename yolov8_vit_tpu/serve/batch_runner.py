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
from collections import defaultdict, deque
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
    # optional jax.sharding.Mesh with a "data" axis: request batches shard
    # over it (params replicate; the XLA partitioner emits the collectives).
    # max_batch must be a multiple of the data-axis size.
    mesh: object = None

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

        # rare-path reclassify for budget overflow: the SAME device ops as
        # the fused pipeline (crop_to_patches_i8 + classifier), fed explicit
        # slots — labels are bit-identical to what the fused graph would
        # have produced with a larger budget, so the production path matches
        # the reference's classify-every-kept-box semantics
        # (`/root/reference/YOLOTensorRT_yolodet_py_解读.md:94-117`) at ANY
        # scene density.
        def classify_slots(params, images, slot_img, slot_boxes):
            from yolov8_vit_tpu.ops.crop import crop_to_patches_i8
            vs = self.pipeline.vit_spec
            crops = crop_to_patches_i8(images, slot_img, slot_boxes,
                                       (vs.img_size, vs.img_size), vs.patch)
            logits = self.pipeline.classifier.apply(params["vit"], crops)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return (jnp.argmax(probs, axis=-1).astype(jnp.int32),
                    jnp.max(probs, axis=-1))

        from yolov8_vit_tpu.models.vit import vit_compiler_options
        copts = vit_compiler_options(self.pipeline.vit_spec)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if self.max_batch % self.mesh.shape["data"]:
                raise ValueError(
                    f"max_batch {self.max_batch} must be a multiple of the "
                    f"data axis ({self.mesh.shape['data']})")
            data = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            reptree = jax.tree.map(lambda _: rep, self.params)
            self._fn = jax.jit(packed, in_shardings=(reptree, data),
                               out_shardings=data, compiler_options=copts)
        else:
            self._fn = jax.jit(packed, compiler_options=copts)
        self._cls_fn = jax.jit(classify_slots, compiler_options=copts)

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

    def _enqueue(self, paths: Sequence[str],
                 profile: dict | None = None) -> dict:
        """Decode + dispatch every chunk to the device (async); returns the
        in-flight request state for `_finish`."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(min(8, max(len(paths), 1))) as pool:
            imgs = list(pool.map(self._decode, paths))
        t1 = time.perf_counter()
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for i, img in enumerate(imgs):
            if img is not None:
                buckets[img.shape[:2]].append(i)
        pending = []   # (chunk indices, device images, device result)
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
                dev_batch = jnp.asarray(batch)
                pending.append((chunk, dev_batch,
                                self._fn(self.params, dev_batch)))
        t2 = time.perf_counter()
        if profile is not None:
            profile["decode_ms"] = profile.get("decode_ms", 0.0) + \
                (t1 - t0) * 1e3
            profile["enqueue_ms"] = profile.get("enqueue_ms", 0.0) + \
                (t2 - t1) * 1e3
        return {"n": len(paths), "pending": pending}

    def _finish(self, state: dict,
                profile: dict | None = None) -> list[dict | None]:
        """Materialize the results of an `_enqueue`d request."""
        import time
        results: list[dict | None] = [None] * state["n"]
        t2 = time.perf_counter()
        t_over = 0.0
        for chunk, dev_batch, dev in state["pending"]:
            packed = np.asarray(dev)
            recs = self._unpack(packed)
            to = time.perf_counter()
            self._reclassify_overflow(recs[:len(chunk)], dev_batch)
            t_over += time.perf_counter() - to
            # zip drops the padded tail rows (chunk is the source of truth)
            for idx, rec in zip(chunk, recs):
                results[idx] = rec
        t3 = time.perf_counter()
        if profile is not None:
            profile["fetch_ms"] = profile.get("fetch_ms", 0.0) + \
                (t3 - t2 - t_over) * 1e3
            profile["overflow_ms"] = profile.get("overflow_ms", 0.0) + \
                t_over * 1e3
        return results

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
        with nothing left to hide it), overflow_ms (rare-path budget
        reclassify)."""
        return self._finish(self._enqueue(paths, profile), profile)

    def run_stream(self, requests, profile: dict | None = None):
        """Generator over a stream of requests (each a path list), with
        CROSS-REQUEST pipelining: request N+1 decodes and enqueues while
        request N's results are still in flight — the reference's analogue
        is its thread-per-URL ingest feeding one hot loop
        (`/root/reference/app.py:45-63`).  Yields one result list per
        request, in order."""
        it = iter(requests)
        prev = None
        for paths in it:
            state = self._enqueue(paths, profile)
            if prev is not None:
                yield self._finish(prev, profile)
            prev = state
        if prev is not None:
            yield self._finish(prev, profile)

    def run_device_batches(self, dev_batches, profile: dict | None = None
                           ) -> list[list[dict]]:
        """Throughput-oriented bulk path for DEVICE-RESIDENT frame batches
        (camera DMA rings, a previous pipeline stage, replayed buffers):
        no decode, no upload.  Fused steps enqueue a bounded DEPTH ahead
        of the drain with ASYNC result copies (device->host transfers
        stream behind compute instead of paying a blocking round trip per
        batch — on the tunneled rig that round trip is ~30 ms against a
        ~24 ms step).  The depth bound matters for the overflow ladder:
        the device queue is FIFO, so a ladder chunk dispatched at drain
        time executes behind every fused step enqueued so far.  An
        enqueue-everything-first variant made each chunk wait out the
        WHOLE remaining queue (patch stalls up to ~230 ms; the bench
        headline dropped 1,292 -> 590 img/s on a day where 3/16 calibrated
        pools overflowed — e60, docs/performance.md).  With depth 4, a
        chunk waits at most ~4 steps (~100 ms) while its patch comes ~8
        drain iterations (~200 ms) later — never blocking.

        Latency-oriented streaming stays `run_stream` (per-request
        yields); this is the bench/bulk analogue.  Returns one rec list
        per input batch, ladder-patched (classify-every-kept-box
        semantics at any density)."""
        import time
        depth = 4
        pending: deque = deque()
        window: deque = deque()
        out = []
        stats = {"fetch": 0.0, "ladder": 0.0, "over": 0}

        def drain_one():
            dv, res = pending.popleft()
            t0 = time.perf_counter()
            recs = self._unpack(np.asarray(res))
            t1 = time.perf_counter()
            for part_dev in self._ladder_dispatch(recs, dv):
                stats["over"] += len(part_dev[0])
                window.append(part_dev)
                if len(window) >= 8:
                    self._ladder_patch(*window.popleft())
            stats["fetch"] += t1 - t0
            stats["ladder"] += time.perf_counter() - t1
            out.append(recs)

        for dv in dev_batches:
            res = self._fn(self.params, dv)
            try:
                res.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass   # platform without async host copies: asarray below
            pending.append((dv, res))
            if len(pending) > depth:
                drain_one()
        while pending:
            drain_one()
        t2 = time.perf_counter()
        while window:
            self._ladder_patch(*window.popleft())
        stats["ladder"] += time.perf_counter() - t2
        if profile is not None:
            profile["fetch_ms"] = profile.get("fetch_ms", 0.0) + \
                stats["fetch"] * 1e3
            profile["overflow_ms"] = profile.get("overflow_ms", 0.0) + \
                stats["ladder"] * 1e3
            profile["overflow_dets"] = profile.get("overflow_dets", 0) + \
                stats["over"]
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _host_inflate(boxes: np.ndarray, w: int, h: int) -> np.ndarray:
        """Host replica of the fused graph's crop-box arithmetic
        (models/two_stage.py: round -> ops.boxes.inflate_boxes -> round).
        Integer-exact: np.round and jnp.round are both ties-to-even and the
        inflation is integer floor-division."""
        ib = np.round(boxes.astype(np.float64)).astype(np.int32) \
               .astype(np.float32)
        dx = ((np.floor(ib[:, 2] - ib[:, 0]).astype(np.int32) // 10) // 2) \
            .astype(np.float32)
        dy = ((np.floor(ib[:, 3] - ib[:, 1]).astype(np.int32) // 10) // 2) \
            .astype(np.float32)
        out = np.stack([np.maximum(0.0, ib[:, 0] - dx),
                        np.maximum(0.0, ib[:, 1] - dy),
                        np.minimum(float(w), ib[:, 2] + dx),
                        np.minimum(float(h), ib[:, 3] + dy)], -1)
        return np.round(out).astype(np.int32)

    def _reclassify_overflow(self, recs: list, dev_batch) -> None:
        """Classify detections the fused graph's compaction budget dropped
        (final_valid but cls_label == -1), patching recs in place.

        The reference classifies EVERY kept detection
        (`/root/reference/app.py:39-42`); the fused graph classifies at most
        B*budget crops.  Overflow is rare (<1e-4 at production densities,
        docs/performance.md), so this rare path re-runs the dropped crops
        through the SAME device crop+classifier ops in K-slot chunks —
        labels match the fused path's at any density."""
        over = [(r, int(k)) for r, rec in enumerate(recs)
                for k in np.nonzero(rec["final_valid"]
                                    & (rec["cls_labels"] < 0))[0]]
        if not over:
            return
        h, w = int(dev_batch.shape[1]), int(dev_batch.shape[2])
        k_small = self.max_batch * self.pipeline.classify_budget
        # two chunk sizes (each compiles once): small keeps the common
        # couple-of-crops overflow cheap; large (8x) bounds the device
        # round-trips on pathological dense scenes (a 93-box/frame bench
        # scene overflowed ~711 crops -> 23 dispatches at small-only)
        # chunks are independent: keep a window of dispatches in flight
        # (async), materializing the oldest as new ones enqueue — the
        # fetches overlap the later dispatches instead of paying one full
        # host<->device round trip per chunk (on tunneled transports each
        # fetch is tens of ms; overflow_ms 1,210 -> 725 on the dense bench
        # scene, docs/performance.md).  The window caps in-flight uploads
        # so a pathologically dense scene (thousands of overflow crops)
        # can't queue unbounded host->device transfers at once; at <=8
        # chunks in flight the dense-scene overlap is already complete
        # (23 small-chunk dispatches was the worst observed).
        window: deque = deque()
        max_in_flight = 8
        for part_dev in self._ladder_dispatch(recs, dev_batch, over):
            window.append(part_dev)
            if len(window) >= max_in_flight:
                self._ladder_patch(*window.popleft())
        while window:
            self._ladder_patch(*window.popleft())

    def _ladder_dispatch(self, recs: list, dev_batch, over=None):
        """Yield (part, device result) ladder dispatches for the overflow
        detections in `recs` — `part` holds (rec, det index) pairs for
        `_ladder_patch`.  Dispatch is async; two chunk sizes (each
        compiles once): small keeps the common couple-of-crops overflow
        cheap; large (8x) bounds device round-trips on pathological dense
        scenes (a 93-box/frame bench scene overflowed ~711 crops -> 23
        dispatches at small-only)."""
        if over is None:
            over = [(r, int(k)) for r, rec in enumerate(recs)
                    for k in np.nonzero(rec["final_valid"]
                                        & (rec["cls_labels"] < 0))[0]]
        h, w = int(dev_batch.shape[1]), int(dev_batch.shape[2])
        k_small = self.max_batch * self.pipeline.classify_budget
        k_large = k_small * 8
        start = 0
        while start < len(over):
            k_slots = k_large if len(over) - start > k_small else k_small
            part = over[start:start + k_slots]
            start += len(part)
            slot_img = np.zeros((k_slots,), np.int32)
            slot_boxes = np.zeros((k_slots, 4), np.int32)
            for j, (r, k) in enumerate(part):
                slot_img[j] = r
                slot_boxes[j] = self._host_inflate(
                    recs[r]["boxes"][k:k + 1], w, h)[0]
            fetched = self._cls_fn(self.params, dev_batch,
                                   jnp.asarray(slot_img),
                                   jnp.asarray(slot_boxes))
            for arr in fetched:
                try:
                    arr.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass   # no async host copies: _ladder_patch blocks
            # async copies make the later _ladder_patch materialization
            # ~free; a blocking fetch here costs a full device round trip
            # per chunk (~75 ms measured on the tunnel vs 0.5 ms async —
            # e62, docs/performance.md)
            yield ([(recs[r], k) for r, k in part], fetched)

    @staticmethod
    def _ladder_patch(part, fetched) -> None:
        labels, scores = map(np.asarray, fetched)
        for j, (rec, k) in enumerate(part):
            for field in ("cls_labels", "cls_scores"):
                if not rec[field].flags.writeable:
                    rec[field] = rec[field].copy()
            rec["cls_labels"][k] = labels[j]
            rec["cls_scores"][k] = scores[j]

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
    """Build a BatchRunner from engine dirs (random params when absent).

    det_engine_path may also be a merged "two_stage" engine (the one-
    artifact deployable from `mt-export two-stage`): its baked pipeline
    config + both param trees are used directly and vit_engine_path is
    ignored."""
    import dataclasses as _dc
    from yolov8_vit_tpu.models.vit import ViTSpec
    from yolov8_vit_tpu.runtime.engine import Engine

    vit_spec = ViTSpec()
    det_params = vit_params = None
    if det_engine_path:
        # config+params reader only (the runner jits its own graph), so
        # skip the AOT blob scan and its dtype-mismatch warning
        eng = Engine(det_engine_path, dtype=dtype, _load_aot=False)
        if eng.kind == "two_stage":
            pipe = TwoStagePipeline(
                det_cfg=eng.det_cfg,
                vit_spec=_dc.replace(eng.vit_spec, attn_impl="fused"),
                num_classes=eng.num_classes,
                classify_budget=eng.meta.get("classify_budget",
                                             classify_budget),
                det_overrides=tuple(
                    sorted(eng.meta.get("det_spec", {}).items())),
                dtype=dtype)
            return BatchRunner(pipe, eng.params)
        det_cfg = eng.det_cfg
        det_params = eng.params
        # custom depth/width scales (engine meta "det_spec") must reach the
        # pipeline or the loaded params mismatch the traced model
        det_overrides = tuple(sorted(eng.meta.get("det_spec", {}).items()))
    else:
        det_overrides = ()
    num_classes = 5
    if vit_engine_path:
        ceng = Engine(vit_engine_path, _load_aot=False)
        vit_spec = ceng.vit_spec
        vit_params = ceng.params
        num_classes = ceng.num_classes
    # attn_impl is a runtime choice, not a weight property: serving always
    # takes the fused-attention kernel (argmax-stable vs the module path,
    # tests/test_fused_attention.py).  pad_tokens is NOT auto-set: lane-
    # padding B/8's 785 tokens measured slower end-to-end (the sequence
    # kernels are already sublane-clean; docs/performance.md round 3) —
    # callers can still opt in via the engine's vit_spec.
    vit_spec = _dc.replace(vit_spec, attn_impl="fused")

    pipe = TwoStagePipeline(det_cfg=det_cfg, vit_spec=vit_spec,
                            num_classes=num_classes,
                            classify_budget=classify_budget, dtype=dtype,
                            det_overrides=det_overrides)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(rng_seed))
    if det_params is not None:
        params["det"] = det_params
    if vit_params is not None:
        params["vit"] = vit_params
    return BatchRunner(pipe, params)
