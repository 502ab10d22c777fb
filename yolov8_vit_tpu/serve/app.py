"""HTTP service — route-for-route parity with the reference Flask app
(`/root/reference/app.py`), built on the stdlib WSGI stack (no Flask/Redis):

  POST /            batch two-stage inference over image URLs      (:45-63)
  POST /getImage    label ingestion + auto-retrain counter          (:66-103)
  GET  /map?location=...   marker map HTML                          (:106-142)
  GET/POST /getConfig      service config read/update               (:145-164)
  GET/POST /trainNow       manual retrain trigger                   (:167-190)
  GET  /logs        training-log page                               (:193-196)
  GET  /chart-data  SSE metric stream                               (:199-224)
  GET  /stream      SSE log stream (flask_sse blueprint parity)     (:22)

Unlike the reference, /chart-data streams REAL training metrics when a
training job is active (the reference emits random demo values,
SURVEY.md §4) and falls back to demo values otherwise.
"""
from __future__ import annotations

import json
import os
import random
import socketserver
import threading
import time
import urllib.parse
import uuid
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable
from wsgiref.simple_server import make_server, WSGIRequestHandler, WSGIServer

import cv2

from yolov8_vit_tpu.config import ServiceConfig, CLASS_NAMES
from yolov8_vit_tpu.serve.downloads import download_images, safe_filename
from yolov8_vit_tpu.serve.infer import main as infer_main, draw_image
from yolov8_vit_tpu.serve.oss import make_object_store
from yolov8_vit_tpu.serve.sse import HUB
from yolov8_vit_tpu.data.voc import generate_annotation


def _json_response(start_response, obj, status="200 OK"):
    body = json.dumps(obj, ensure_ascii=False).encode()
    start_response(status, [("Content-Type", "application/json; charset=utf-8"),
                            ("Content-Length", str(len(body)))])
    return [body]


def _html_response(start_response, html: str):
    body = html.encode()
    start_response("200 OK", [("Content-Type", "text/html; charset=utf-8"),
                              ("Content-Length", str(len(body)))])
    return [body]


from yolov8_vit_tpu.serve.templates import (logs_page, map_page,
                                            heatmap_page)


class InspectionService:
    """The serving application.  Wire it to real engines via the `runner`
    callable, or leave None for an echo backend (useful in tests)."""

    #: max concurrent URL downloads in route_upload (class attr so tests
    #: can shrink it to observe the bound)
    DOWNLOAD_POOL_SIZE = 8

    def __init__(self, workdir: str = ".",
                 runner: Callable | None = None,
                 retrain_fn: Callable | None = None,
                 geocode_fn: Callable | None = None):
        self.workdir = workdir
        self.runner = runner          # (input_dir) -> list of det tuples
        self.retrain_fn = retrain_fn  # (log: bool) -> None
        self.geocode_fn = geocode_fn
        self.config = ServiceConfig(os.path.join(workdir, "train/config.json"))
        self.oss = make_object_store(os.path.join(workdir, "oss_local"))
        self.training_epochs_left = 0   # reference global `epoch` (:33,:174-179)
        self._train_lock = threading.Lock()
        self.metrics_path = os.path.join(workdir, "train/result.json")
        # real cover locations ingested via /getImage (payload lat/lng or a
        # geocodable "location" string); /map and /heatmap render these when
        # present, demo-sampled points otherwise.  Bounded (one entry per
        # upload for the life of the process would grow without limit) and
        # lock-guarded: appends happen on request-handler threads while /map
        # and /heatmap snapshot concurrently.
        self.label_locations: deque[dict] = deque(maxlen=10_000)
        self._locations_lock = threading.Lock()

    # ---- route handlers ---------------------------------------------------
    def route_upload(self, payload: dict):
        """POST / — download URLs in parallel threads, run two-stage infer.

        Each request downloads into its OWN subdirectory of input/: the
        reference reuses one never-cleaned folder and re-runs inference
        over every image ever posted (`/root/reference/app.py:52-62`), so
        its second response mixes in the first request's detections and
        per-request latency grows without bound — a weakness in the same
        class as the unbounded download threads below, fixed the same
        way (deviation documented here; the downloaded images are kept,
        as the reference keeps them)."""
        urls = payload.get("urls") or []
        if not urls:
            return {"错误": "我需要post请求"}
        input_dir = os.path.join(self.workdir, "input",
                                 f"req-{uuid.uuid4().hex[:12]}")
        os.makedirs(input_dir, exist_ok=True)
        # Bounded pool, NOT thread-per-URL: the reference spawns one thread
        # per URL with no cap (`/root/reference/app.py:50-59`, a documented
        # weakness, SURVEY.md §5) — 1,000 URLs would mean 1,000 live threads.
        # download_images carries its own 10 s timeout and returns False on
        # failure, so one bad URL can neither hang nor poison the batch.
        # entries are {"name": url} dicts (reference payload shape); skip
        # malformed ones instead of 500ing the whole request
        todo = [list(u.values())[0] for u in urls
                if isinstance(u, dict) and u]
        with ThreadPoolExecutor(max_workers=self.DOWNLOAD_POOL_SIZE) as pool:
            futures = [pool.submit(download_images, u, input_dir)
                       for u in todo]
            for f in futures:
                # per-URL failure isolation: download_images returns False
                # on failure, but a raising downloader must not abort the
                # rest of the batch either
                exc = f.exception()
                if exc is not None:
                    print(f"download error: {exc}")
        if self.runner is None:
            return {"output": [], "note": "no engine configured"}
        return self.runner(input_dir)

    def route_get_image(self, payload: dict):
        """POST /getImage — ingest corrected labels, bump retrain counter."""
        url = payload.get("imageUrl")
        if not url:
            return {"错误": "我需要post请求"}
        train_new = os.path.join(self.workdir, "train/new")
        out_dir = os.path.join(self.workdir, "output")
        os.makedirs(train_new, exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)
        from urllib.parse import urlsplit
        image = download_images(url, train_new, 0)
        # path component only: basename on the raw URL picks the tail of a
        # query value when the signature carries '/' (downloads.py shares
        # this rule)
        basename = safe_filename(os.path.basename(urlsplit(url).path))
        if image is False:
            return {"错误": f"download failed: {url}"}
        cv2.imwrite(os.path.join(train_new, basename), image)
        objects = payload.get("objects") or []
        # labels come from an external tool: tolerate malformed entries
        # (non-dict items, missing keys) instead of 500ing the ingest —
        # the reference KeyErrors here, a weakness not worth preserving
        objects = [o for o in objects
                   if isinstance(o, dict)
                   and {"xmin", "ymin", "xmax", "ymax", "sort"} <= o.keys()
                   ] if isinstance(objects, list) else []
        for obj in objects:
            draw_image(image, [obj["xmin"], obj["ymin"], obj["xmax"],
                               obj["ymax"]], obj["sort"])
        out_path = os.path.join(out_dir, basename)
        cv2.imwrite(out_path, image)
        generate_annotation("", basename, basename, objects,
                            save_dir=train_new)

        def syc_retrain():
            self.oss.put_object_from_file("FuChuang/" + basename, out_path)
            try:
                os.remove(out_path)
            except OSError:
                pass
            _num, due = self.config.bump_and_check()
            if due and self.retrain_fn is not None:
                self._auto_retrain()

        self._ingest_location(payload, objects)
        threading.Thread(target=syc_retrain, daemon=True).start()
        return {"url": self.oss.getUrl("FuChuang/" + basename)}

    def _ingest_location(self, payload: dict, objects: list) -> None:
        """Record the label's geolocation when the /getImage payload carries
        one — explicit {"lat","lng"} floats, or a "location" address string
        resolved through the geocoder.  Feeds the real-data branch of /map
        and /heatmap."""
        lat = lng = None
        try:
            if "lat" in payload and "lng" in payload:
                lat, lng = float(payload["lat"]), float(payload["lng"])
            elif payload.get("location") and self.geocode_fn:
                _, lnglat = self.geocode_fn(payload["location"])
                if lnglat:
                    lng_s, lat_s = lnglat.split(",")
                    lat, lng = float(lat_s), float(lng_s)
        except (TypeError, ValueError):
            return
        if lat is None:
            return
        cls = objects[0]["sort"] if objects else "good"
        with self._locations_lock:
            self.label_locations.append({"lat": lat, "lng": lng, "cls": cls})

    def _snapshot_locations(self) -> list[dict]:
        with self._locations_lock:
            return list(self.label_locations)

    def route_map(self, query: dict) -> str:
        """GET /map — filterable marker map around a geocoded location
        (reference `/root/reference/app.py:106-142`: folium markers with
        per-class icons + TagFilterButton around 100 sampled points)."""
        location = query.get("location", "")
        lat, lng = 39.9, 116.4   # default center (Beijing)
        if location and self.geocode_fn:
            _, lnglat = self.geocode_fn(location)
            if lnglat:
                # geocoder returns "lng,lat" (AMap contract)
                lng_s, lat_s = lnglat.split(",")
                lat, lng = float(lat_s), float(lng_s)
        markers = self._snapshot_locations()
        if markers:
            # real ingested-label locations (the reference renders only
            # demo-sampled points, `/root/reference/app.py:113-142`;
            # plumbing the ingested data through is the useful superset)
            if not location:
                lat = sum(m["lat"] for m in markers) / len(markers)
                lng = sum(m["lng"] for m in markers) / len(markers)
        else:
            rng = random.Random(0)
            markers = [
                {"lat": lat + rng.gauss(0, 0.5),
                 "lng": lng + rng.gauss(0, 0.5),
                 "cls": rng.choice(CLASS_NAMES)}
                for _ in range(100)]
        return map_page(markers, (lat, lng), location)

    def route_heatmap(self) -> str:
        """GET /heatmap — density page (reference `templates/map.html` +
        static heatmapData.js); demo-sampled points, swap in real cover
        locations by overriding `heatmap_points`."""
        points = getattr(self, "heatmap_points", None)
        if not points:
            points = [{"lng": m["lng"], "lat": m["lat"], "count": 10}
                      for m in self._snapshot_locations()]
        if not points:
            rng = random.Random(1)
            points = [
                {"lng": 116.4 + rng.gauss(0, 0.25),
                 "lat": 39.9 + rng.gauss(0, 0.18),
                 "count": rng.randint(1, 100)}
                for _ in range(400)]
        return heatmap_page(points)

    def route_train_now(self):
        """POST/GET /trainNow — reference :167-190 semantics incl. the
        'already running' guard.

        Deviation (documented): the reference's actual training launch is
        commented out (`/root/reference/app.py:186-187` — `trainNowRe()` /
        `process.start()` are both disabled, so its /trainNow only resets
        the counter and rewrites config.json).  This route implements the
        endpoint's documented intent and really launches the retrain in a
        background thread."""
        with self._train_lock:
            if self.training_epochs_left > 0:
                return {"state": "模型正在运行"}
            # atomic counter reset (a separate read()+write() pair would
            # silently overwrite concurrent /getConfig updates); only AFTER
            # the running guard — an early return must not zero the
            # labels-since-last-retrain counter (reference :167-190)
            cfg = self.config.update(num=0)
            # claim with at least 1 so the running guard holds even when
            # the configured epoch count is 0
            self.training_epochs_left = max(int(cfg.get(
                "class_config", {}).get("epoch", 10) or 0), 1)
        if self.retrain_fn is not None:
            def run():
                try:
                    self._call_retrain(True)
                finally:
                    with self._train_lock:
                        self.training_epochs_left = 0
            threading.Thread(target=run, daemon=True).start()
        else:
            with self._train_lock:
                self.training_epochs_left = 0
        return {"state": "启动成功"}

    def _auto_retrain(self) -> None:
        """The 100-label auto path claims the same training slot as
        /trainNow.  The reference lets the two race (`sycRetrain` calls
        `retrain()` with no guard, `/root/reference/app.py:84-98`):
        concurrent runs race `deliver()`'s shutil.move on the same files
        and interleave the non-atomic engine-dir writes.  A due
        auto-retrain that finds a run in flight is skipped — the
        ingested labels stay in train/new for the next trigger."""
        with self._train_lock:
            if self.training_epochs_left > 0:
                return
            # claim with at least 1 so the guard holds even when the
            # configured epoch count is 0
            self.training_epochs_left = max(int(self.config.read().get(
                "class_config", {}).get("epoch", 10) or 0), 1)
        try:
            self._call_retrain(False)
        finally:
            with self._train_lock:
                self.training_epochs_left = 0

    def _call_retrain(self, log: bool) -> None:
        """Invoke retrain_fn, forwarding the service config's
        class_config.epoch so the /getConfig knob actually reaches the
        training run (retrain_fns that take only `log` still work)."""
        import inspect
        epochs = self.config.read().get("class_config", {}).get("epoch")
        # Accept the kwarg through **kwargs too (a bare name check silently
        # dropped the knob for retrain_fns declared with **kwargs);
        # inspect.signature itself resolves functools.partial wrappers.
        try:
            params = inspect.signature(self.retrain_fn).parameters
            takes_epochs = "epochs" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in params.values())
        except (TypeError, ValueError):   # C callables etc.
            takes_epochs = False
        if takes_epochs:
            self.retrain_fn(log, epochs=epochs)
        else:
            self.retrain_fn(log)

    def _chart_stream(self):
        """SSE generator: real metrics from result.json if present, else the
        reference's demo distribution (`app.py:202-218`)."""
        tms = 0
        last_sent = None
        for _ in range(120):
            tms += 1
            data = None
            if os.path.exists(self.metrics_path):
                try:
                    with open(self.metrics_path) as f:
                        rows = json.load(f)
                    if rows:
                        k = max(rows, key=lambda s: int(s))
                        if k != last_sent:
                            last_sent = k
                            row = rows[k]
                            data = {"time": int(k),
                                    "value1": row.get("train_acc", 0),
                                    "value2": row.get("val_acc", 0)}
                except (json.JSONDecodeError, OSError):
                    pass
            if data is None:
                def rdn(num):
                    r = random.normalvariate(num, 0.03)
                    return max(num - 0.03, min(r, num + 0.03))
                data = {"time": tms, "value1": rdn(0.95), "value2": rdn(0.91)}
            yield f"data:{json.dumps(data)}\n\n".encode()
            time.sleep(1)

    # ---- WSGI -------------------------------------------------------------
    def wsgi(self, environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        # percent-decode like Flask's request.args does: a browser encodes
        # /map?location=北京 as %E5%8C%97%E4%BA%AC, and the geocoder must
        # see the decoded address, not the literal percent-escapes
        query = {k: v[-1] for k, v in urllib.parse.parse_qs(
            environ.get("QUERY_STRING") or "",
            keep_blank_values=True).items()}

        def read_json():
            try:
                n = int(environ.get("CONTENT_LENGTH") or 0)
                out = json.loads(environ["wsgi.input"].read(n) or b"{}")
                # routes index with .get(): a top-level array/scalar body
                # must degrade to "missing fields", not crash the handler
                return out if isinstance(out, dict) else {}
            except (ValueError, KeyError):
                return {}

        if path == "/" and method == "POST":
            return _json_response(start_response, self.route_upload(read_json()))
        if path == "/":
            return _json_response(start_response, {"错误": "我需要post请求"})
        if path == "/getImage":
            if method != "POST":
                return _json_response(start_response, {"错误": "我需要post请求"})
            return _json_response(start_response,
                                  self.route_get_image(read_json()))
        if path == "/map":
            return _html_response(start_response, self.route_map(query))
        if path == "/heatmap":
            return _html_response(start_response, self.route_heatmap())
        if path == "/getConfig":
            if method == "POST":
                pos = read_json()
                cfg = self.config.read()
                for key in ("standard", "class_config", "detect_config"):
                    if key in pos:
                        cfg[key] = pos[key]
                self.config.write(cfg)
                return _json_response(start_response, {"state": "修改成功"})
            return _json_response(start_response, self.config.read())
        if path == "/trainNow":
            return _json_response(start_response, self.route_train_now())
        if path == "/logs":
            # ?mobile=1 serves the landscape-rotate variant (the reference
            # ships it as a second template, `templates/index.html:12-46`);
            # explicit opt-outs ("0", "false") stay on the landscape page
            mobile = query.get("mobile", "").lower() not in ("", "0", "false")
            return _html_response(start_response, logs_page(mobile=mobile))
        if path == "/chart-data":
            start_response("200 OK", [
                ("Content-Type", "text/event-stream"),
                ("Cache-Control", "no-cache"),
                ("X-Accel-Buffering", "no")])
            return self._chart_stream()
        if path == "/stream":
            q = HUB.subscribe()
            start_response("200 OK", [
                ("Content-Type", "text/event-stream"),
                ("Cache-Control", "no-cache")])
            return HUB.stream(q)
        return _json_response(start_response, {"error": "not found"},
                              status="404 Not Found")

    def make_http_server(self, host: str = "0.0.0.0", port: int = 5000):
        """Build the HTTP server (one thread per request: /stream and
        /chart-data hold their connection open indefinitely (SSE), so the
        single-threaded default WSGIServer would wedge every other route
        the moment one dashboard client connects)."""
        class QuietHandler(WSGIRequestHandler):
            def log_message(self, *args):
                pass

        class ThreadingServer(socketserver.ThreadingMixIn, WSGIServer):
            daemon_threads = True

        return make_server(host, port, self.wsgi,
                           server_class=ThreadingServer,
                           handler_class=QuietHandler)

    def serve(self, host: str = "0.0.0.0", port: int = 5000):
        with self.make_http_server(host, port) as httpd:
            print(f"serving on {host}:{httpd.server_address[1]}")
            httpd.serve_forever()


def build_default_service(workdir: str = ".",
                          detect_engine_path: str | None = None,
                          classify_engine_path: str | None = None,
                          enable_retrain: bool = True,
                          fused: bool = False):
    """Wire InspectionService to real engines (the reference's module-level
    init at `/root/reference/app.py:20-42`) and the classifier retrain loop
    (`:91-94`: `retrain()` fires when the label counter reaches standard;
    `yoloRetrain` stays opt-in, as the reference ships it commented out).

    fused=False runs the inferdet-parity host path (handles arbitrary
    mixed image sizes); fused=True routes POST / through the single-graph
    BatchRunner (resolution-bucketed, the production TPU path)."""
    runner = None
    if detect_engine_path and os.path.isdir(detect_engine_path):
        with open(os.path.join(detect_engine_path, "meta.json")) as f:
            kind = json.load(f).get("kind")
        if kind == "two_stage":
            # the merged one-artifact deployable (mt-export two-stage)
            # bakes the whole pipeline — only the fused path can run it
            fused = True
        if fused:
            from yolov8_vit_tpu.serve.batch_runner import make_runner
            br = make_runner(detect_engine_path, classify_engine_path)

            def runner(input_dir):
                paths = sorted(
                    os.path.join(input_dir, f)
                    for f in os.listdir(input_dir)
                    if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
                return br.flatten(paths, br.run_paths(paths))
        else:
            from yolov8_vit_tpu.runtime.engine import Engine
            det = Engine(detect_engine_path)
            det.set_desired(["num_dets", "bboxes", "scores", "labels"])
            model_list = []
            if classify_engine_path and os.path.isdir(classify_engine_path):
                model_list.append(Engine(classify_engine_path))

            def runner(input_dir):
                return infer_main(det, input_dir, model_list=model_list)

    retrain_fn = None
    if enable_retrain:
        def retrain_fn(log, epochs=None):
            import dataclasses as _dc
            from yolov8_vit_tpu.config import CFG
            from yolov8_vit_tpu.train.classify import retrain

            def sse_log(msg):
                print(msg)
                HUB.publish({"message": str(msg)}, type_="log")

            # class_config.epoch from the service config drives the run
            # (the /getConfig knob; reference `/root/reference/app.py:169-189`);
            # `is None`, not falsy: an explicit epoch=0 means a zero-epoch
            # run, not the CFG default of 10
            cfg = CFG() if epochs is None else _dc.replace(CFG(),
                                                           epoch=int(epochs))
            retrain(log=log, cfg=cfg, workdir=workdir, log_fn=sse_log)

    from yolov8_vit_tpu.serve.geocode import location2lalo
    return InspectionService(workdir=workdir, runner=runner,
                             retrain_fn=retrain_fn,
                             geocode_fn=location2lalo)


def main_cli(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--detect-engine", default=None)
    ap.add_argument("--classify-engine", default=None)
    ap.add_argument("--fused", action="store_true",
                    help="serve POST / through the single-graph fused "
                         "pipeline (resolution-bucketed BatchRunner)")
    args = ap.parse_args(argv)
    build_default_service(args.workdir, args.detect_engine,
                          args.classify_engine,
                          fused=args.fused).serve(host=args.host,
                                                  port=args.port)


if __name__ == "__main__":
    main_cli()
