"""Service-contract tests: replay the reference app's routes against the
stdlib WSGI service (SURVEY.md §4 plan (d))."""
import json
import os
import threading
import time
import urllib.request
from wsgiref.simple_server import make_server, WSGIRequestHandler

import numpy as np
import cv2
import pytest

from yolov8_vit_tpu.serve.app import InspectionService


class _Quiet(WSGIRequestHandler):
    def log_message(self, *a):
        pass


@pytest.fixture
def service(tmp_path):
    calls = {"retrain": 0}

    def retrain_fn(log):
        calls["retrain"] += 1

    svc = InspectionService(workdir=str(tmp_path), retrain_fn=retrain_fn)
    svc._test_calls = calls
    httpd = make_server("127.0.0.1", 0, svc.wsgi, handler_class=_Quiet)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield svc, f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_root_requires_post_payload(service):
    svc, base = service
    out = json.loads(_get(base + "/"))
    assert "错误" in out


def test_get_config_roundtrip(service):
    svc, base = service
    cfg = json.loads(_get(base + "/getConfig"))
    assert cfg["num"] == 0 and "standard" in cfg
    out = _post(base + "/getConfig", {"standard": 5,
                                      "class_config": {"epoch": 3},
                                      "detect_config": {}})
    assert out == {"state": "修改成功"}
    cfg = json.loads(_get(base + "/getConfig"))
    assert cfg["standard"] == 5 and cfg["class_config"]["epoch"] == 3


def test_get_image_ingests_label_and_counts(service, tmp_path):
    svc, base = service
    # serve a local image over the same HTTP server? simpler: file:// is not
    # supported by download_images (requests); spin a tiny file server.
    img_dir = tmp_path / "srv"
    img_dir.mkdir()
    img = np.zeros((50, 60, 3), np.uint8)
    cv2.imwrite(str(img_dir / "cover.jpg"), img)

    import functools
    import http.server
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(img_dir))
    fs = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    fs_port = fs.server_address[1]
    threading.Thread(target=fs.serve_forever, daemon=True).start()
    try:
        out = _post(base + "/getImage", {
            "imageUrl": f"http://127.0.0.1:{fs_port}/cover.jpg",
            "objects": [{"sort": "good", "xmin": 1, "ymin": 2,
                         "xmax": 30, "ymax": 40}]})
        assert "url" in out
        # annotation written to train/new
        xml = os.path.join(svc.workdir, "train/new/cover.xml")
        for _ in range(50):
            if os.path.exists(xml):
                break
            time.sleep(0.1)
        assert os.path.exists(xml)
        # counter bumped (async)
        for _ in range(50):
            if svc.config.read()["num"] == 1:
                break
            time.sleep(0.1)
        assert svc.config.read()["num"] == 1
    finally:
        fs.shutdown()


def test_retrain_fires_at_standard(service):
    svc, base = service
    svc.config.update(standard=2, num=1)
    num, due = svc.config.bump_and_check()
    assert due and num == 0


def test_train_now_guard(service):
    svc, base = service
    svc.training_epochs_left = 5
    out = _post(base + "/trainNow", {})
    assert out == {"state": "模型正在运行"}
    svc.training_epochs_left = 0
    out = _post(base + "/trainNow", {})
    assert out == {"state": "启动成功"}
    # wait for async retrain thread to run
    for _ in range(50):
        if svc._test_calls["retrain"] == 1:
            break
        time.sleep(0.1)
    assert svc._test_calls["retrain"] == 1


def test_chart_data_streams_sse(service):
    svc, base = service
    req = urllib.request.Request(base + "/chart-data")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        line = r.readline().decode()
        assert line.startswith("data:")
        payload = json.loads(line[5:])
        assert "value1" in payload and "value2" in payload


def test_chart_data_prefers_real_metrics(service):
    svc, base = service
    os.makedirs(os.path.dirname(svc.metrics_path), exist_ok=True)
    with open(svc.metrics_path, "w") as f:
        json.dump({"3": {"train_acc": 88.0, "val_acc": 77.0,
                         "loss": 0.5}}, f)
    with urllib.request.urlopen(base + "/chart-data", timeout=10) as r:
        payload = json.loads(r.readline().decode()[5:])
    assert payload == {"time": 3, "value1": 88.0, "value2": 77.0}


def test_logs_page_and_404(service):
    svc, base = service
    page = _get(base + "/logs").decode()
    assert "EventSource" in page
    try:
        _get(base + "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_map_page(service):
    svc, base = service
    page = _get(base + "/map?location=beijing").decode()
    assert "markers" in page


def test_service_config_concurrent_bumps(tmp_path):
    """The reference's retrain counter races on config.json
    (SURVEY.md §5); ours must count exactly under thread contention."""
    import concurrent.futures
    from yolov8_vit_tpu.config import ServiceConfig
    cfg = ServiceConfig(str(tmp_path / "config.json"))
    cfg.update(standard=1000)
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        list(pool.map(lambda _: cfg.bump_and_check(), range(64)))
    assert cfg.read()["num"] == 64


def test_download_rejects_path_traversal(tmp_path):
    """A malicious Content-Disposition must not escape save_folder
    (ADVICE r1: sanitize the final filename)."""
    import http.server
    from yolov8_vit_tpu.serve.downloads import download_images

    ok, img = cv2.imencode(".jpg", np.zeros((8, 8, 3), np.uint8))
    assert ok
    payload = img.tobytes()

    class EvilHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Disposition",
                             'attachment; filename="../../evil.jpg"')
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), EvilHandler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    save = tmp_path / "inner" / "input"
    try:
        # URL path ends in '/' -> empty basename -> Content-Disposition used
        path = download_images(f"http://127.0.0.1:{port}/", str(save), 1)
        assert path, "download failed"
        resolved = os.path.realpath(path)
        assert resolved.startswith(os.path.realpath(str(save)) + os.sep)
        assert os.path.basename(resolved) == "evil.jpg"
        assert not os.path.exists(tmp_path / "evil.jpg")
    finally:
        srv.shutdown()


def test_map_geocoded_center_not_swapped(tmp_path):
    """Geocoder returns "lng,lat" (AMap contract); markers must carry a
    valid latitude (regression: the geocode branch transposed lat/lng
    relative to the default-center path)."""
    import re as _re
    svc = InspectionService(
        workdir=str(tmp_path),
        geocode_fn=lambda loc: ("somewhere", "116.40,39.90"))
    page = svc.route_map({"location": "beijing"})
    lats = [float(v) for v in _re.findall(r'"lat":\s*([-\d.]+)', page)]
    assert lats and all(-90 <= v <= 90 for v in lats)


def test_train_now_plumbs_config_epochs(tmp_path):
    """class_config.epoch from the service config must reach the retrain
    run (regression: the knob only fed the guard counter)."""
    seen = {}

    def retrain_fn(log, epochs=None):
        seen["epochs"] = epochs

    svc = InspectionService(workdir=str(tmp_path), retrain_fn=retrain_fn)
    cfg = svc.config.read()
    cfg["class_config"] = {"epoch": 37}
    svc.config.write(cfg)
    svc.route_train_now()
    for _ in range(100):
        if "epochs" in seen:
            break
        time.sleep(0.05)
    assert seen.get("epochs") == 37


def test_download_rfc5987_filename(tmp_path):
    """`filename*=` (RFC 5987) headers must be honored end-to-end
    (regression: the regex applied *? to the letter 'e', so these headers
    always fell through to the timestamp fallback name)."""
    import http.server
    from yolov8_vit_tpu.serve.downloads import download_images

    ok, img = cv2.imencode(".jpg", np.zeros((8, 8, 3), np.uint8))
    assert ok
    payload = img.tobytes()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Disposition",
                             "attachment; filename*=UTF-8''photo.jpg")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        path = download_images(f"http://127.0.0.1:{port}/", str(tmp_path), 1)
        assert path and os.path.basename(path) == "photo.jpg"
    finally:
        srv.shutdown()


def test_logs_mobile_variant(service):
    """`/logs?mobile=1` serves the landscape-rotate variant (the reference
    ships it as `templates/index.html:12-46`); plain /logs does not carry
    the rotate block."""
    svc, base = service
    plain = _get(base + "/logs").decode()
    mobile = _get(base + "/logs?mobile=1").decode()
    assert "orientation: landscape" not in plain
    assert "orientation: landscape" in mobile
    assert "rotate(90deg)" in mobile
    # same chart wiring in both
    for page in (plain, mobile):
        assert "EventSource('/chart-data')" in page


def test_map_renders_ingested_locations(service, tmp_path):
    """Real-data branch of /map and /heatmap: labels ingested with lat/lng
    through /getImage appear on the map (demo fallback otherwise)."""
    svc, base = service
    demo = _get(base + "/map").decode()

    img_dir = tmp_path / "srv2"
    img_dir.mkdir()
    img = np.zeros((50, 60, 3), np.uint8)
    cv2.imwrite(str(img_dir / "c2.jpg"), img)
    import functools
    import http.server
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(img_dir))
    fs = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    fs_port = fs.server_address[1]
    threading.Thread(target=fs.serve_forever, daemon=True).start()
    try:
        _post(base + "/getImage", {
            "imageUrl": f"http://127.0.0.1:{fs_port}/c2.jpg",
            "lat": 31.2304, "lng": 121.4737,
            "objects": [{"sort": "broke", "xmin": 1, "ymin": 2,
                         "xmax": 30, "ymax": 40}]})
    finally:
        fs.shutdown()
    assert list(svc.label_locations) == [
        {"lat": 31.2304, "lng": 121.4737, "cls": "broke"}]
    page = _get(base + "/map").decode()
    assert "31.2304" in page and "121.4737" in page
    assert page != demo
    heat = _get(base + "/heatmap").decode()
    assert "121.4737" in heat


def test_ingest_location_geocode_and_bad_values(service):
    svc, _ = service
    svc.geocode_fn = lambda loc: ("addr", "120.5,30.25")
    svc._ingest_location({"location": "somewhere"},
                         [{"sort": "circle"}])
    assert svc.label_locations[-1] == {"lat": 30.25, "lng": 120.5,
                                      "cls": "circle"}
    n = len(svc.label_locations)
    svc._ingest_location({"lat": "not-a-float", "lng": 1.0}, [])
    assert len(svc.label_locations) == n      # rejected, no crash


def test_upload_download_pool_is_bounded(service, monkeypatch):
    """route_upload must fan out through a bounded pool, not one thread per
    URL (the reference's unbounded version is a documented weakness,
    SURVEY.md §5), with per-URL failure isolation."""
    svc, base = service
    svc.DOWNLOAD_POOL_SIZE = 4

    lock = threading.Lock()
    state = {"live": 0, "peak": 0, "calls": 0}

    def fake_download(url, folder, save_flag=True):
        with lock:
            state["live"] += 1
            state["calls"] += 1
            state["peak"] = max(state["peak"], state["live"])
        time.sleep(0.02)
        try:
            if url.endswith("7"):       # every 10th URL fails...
                raise RuntimeError("boom")
            return False                # ...others "fail" quietly
        finally:
            with lock:
                state["live"] -= 1

    monkeypatch.setattr("yolov8_vit_tpu.serve.app.download_images",
                        fake_download)
    urls = [{"k": f"http://x.invalid/img{i}"} for i in range(100)]
    out = _post(base + "/", {"urls": urls})
    assert state["calls"] == 100          # every URL attempted despite errors
    assert state["peak"] <= 4             # concurrency bounded by the pool
    assert out == {"output": [], "note": "no engine configured"}


def test_query_values_percent_decoded(service):
    """Browsers percent-encode non-ASCII query values; the geocoder must
    see the decoded address, as Flask's request.args delivers it
    (regression: the raw escapes reached location2lalo)."""
    svc, base = service
    seen = {}

    def geocode(loc):
        seen["loc"] = loc
        return ("addr", "116.4,39.9")

    svc.geocode_fn = geocode
    _get(base + "/map?location=%E5%8C%97%E4%BA%AC")   # 北京
    assert seen["loc"] == "北京"


def test_logs_mobile_opt_out(service):
    """`?mobile=0` must serve the landscape page, not the rotate variant
    (regression: bool('0') is True)."""
    svc, base = service
    page = _get(base + "/logs?mobile=0").decode()
    assert "rotate(90deg)" not in page


def test_upload_uses_fresh_dir_per_request(service, monkeypatch, tmp_path):
    """Each POST / runs inference over ITS OWN downloads only.  The
    reference reuses one never-cleaned input/ folder, so its second
    response mixes in the first request's detections
    (`/root/reference/app.py:52-62`) — a documented-weakness fix."""
    svc, base = service

    def fake_download(url, folder, save_flag=True):
        with open(os.path.join(folder, os.path.basename(url)), "wb") as f:
            f.write(b"x")
        return False

    monkeypatch.setattr("yolov8_vit_tpu.serve.app.download_images",
                        fake_download)
    seen_dirs = []

    def runner(input_dir):
        seen_dirs.append(input_dir)
        return {"files": sorted(os.listdir(input_dir))}

    svc.runner = runner
    out1 = _post(base + "/", {"urls": [{"k": "http://x.invalid/a.jpg"}]})
    out2 = _post(base + "/", {"urls": [{"k": "http://x.invalid/b.jpg"}]})
    assert out1 == {"files": ["a.jpg"]}
    assert out2 == {"files": ["b.jpg"]}          # no bleed from request 1
    assert len(set(seen_dirs)) == 2


def test_auto_retrain_respects_running_guard(service):
    """The 100-label auto path claims the same training slot as /trainNow
    (the reference lets them race and corrupt deliver()'s moves)."""
    svc, base = service
    calls = svc._test_calls

    svc.training_epochs_left = 5                  # a run is in flight
    svc._auto_retrain()
    assert calls["retrain"] == 0                  # skipped, not queued

    svc.training_epochs_left = 0
    svc._auto_retrain()
    assert calls["retrain"] == 1                  # ran...
    assert svc.training_epochs_left == 0          # ...and released the slot


def test_serve_server_is_threaded(service):
    """An open SSE /stream connection must not wedge other routes: the
    service's own HTTP server handles requests on separate threads (the
    single-threaded wsgiref default would block on the never-ending
    stream generator)."""
    svc, _ = service
    httpd = svc.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # occupy a handler with the never-ending SSE stream from a
        # background thread (urlopen itself blocks until the generator's
        # first yield, so the request must not be on this thread)
        threading.Thread(
            target=lambda: urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stream", timeout=30).read(1),
            daemon=True).start()
        time.sleep(0.5)                           # handler now in the stream
        cfg = json.loads(_get(f"http://127.0.0.1:{port}/getConfig"))
        assert "standard" in cfg                  # served while SSE is live
    finally:
        httpd.shutdown()


def test_download_filename_from_url_path_not_query(tmp_path):
    """Presigned URLs carry '/' and '.' inside query signatures; the saved
    name must come from the URL PATH component (basename on the raw URL
    picked the signature tail), and same-basename URLs in one folder must
    not overwrite each other (one request's camA/img.jpg + camB/img.jpg
    silently dropped an image before)."""
    import http.server
    from yolov8_vit_tpu.serve.downloads import download_images

    ok, img = cv2.imencode(".jpg", np.zeros((8, 8, 3), np.uint8))
    assert ok
    payload = img.tobytes()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    save = tmp_path / "input"
    try:
        p1 = download_images(
            f"http://127.0.0.1:{port}/cams/a/img.jpg?sig=AbC/XyZ.qrs",
            str(save), 1)
        assert os.path.basename(p1) == "img.jpg", p1
        p2 = download_images(
            f"http://127.0.0.1:{port}/cams/b/img.jpg", str(save), 1)
        assert p2 and p2 != p1, (p1, p2)         # disambiguated, not clobbered
        assert os.path.exists(p1) and os.path.exists(p2)
    finally:
        srv.shutdown()


def test_map_and_heatmap_pages_escape_user_content():
    """XSS hardening: the raw ?location= query reflects into the <h3>, and
    marker classes come verbatim from POST /getImage objects[0]['sort'] —
    both must be inert in HTML (a '</script>' inside the embedded JSON
    ends the script element regardless of JS string context)."""
    from yolov8_vit_tpu.serve.templates import map_page, heatmap_page

    evil_cls = "</script><script>evil()</script>"
    html = map_page([{"lat": 1.0, "lng": 2.0, "cls": evil_cls}], (2.0, 1.0),
                    location_label="<script>alert(1)</script>")
    assert "</script><script>evil" not in html
    assert "<script>alert" not in html
    assert "near &lt;script&gt;" in html
    # unknown classes still get a filter button + dot (drawn client-side);
    # the payload keeps them, '<'-escaped
    assert "\\u003c/script" in html
    html2 = heatmap_page([{"lng": 1.0, "lat": 2.0, "count": 2}])
    assert "const pts" in html2


def test_routes_survive_malformed_bodies(service):
    """Adversarial/malformed requests degrade to the missing-field JSON
    errors instead of 500s: non-JSON bodies, top-level arrays/scalars,
    wrong-typed fields (urls as string/ints, objects entries without
    keys).  One bad client must never take down a route."""
    svc, base = service

    def post_raw(path, body: bytes):
        req = urllib.request.Request(
            base + path, data=body,
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()

    for path in ("/", "/getImage", "/getConfig"):
        for body in (b"not json{", b"[1, 2, 3]", b"5", b'"str"', b"",
                     b'{"urls": "nope"}', b'{"urls": [1, {}, "x"]}'):
            status, payload = post_raw(path, body)
            assert status == 200, (path, body, status)
            json.loads(payload)    # still a JSON contract response
    # objects entries missing keys must not 500 the label ingest
    status, payload = post_raw(
        "/getImage", json.dumps({
            "imageUrl": "http://127.0.0.1:1/none.jpg",
            "objects": [42, {"sort": "good"}, None]}).encode())
    assert status == 200
    json.loads(payload)
