"""Frontend page generators embed valid data + required elements."""
import json
import re

from yolov8_vit_tpu.serve.templates import logs_page, map_page, heatmap_page


def test_logs_page_structure():
    page = logs_page()
    for needle in ("EventSource('/chart-data')", "<svg", "id=\"zoom\""):
        assert needle in page


def test_map_page_embeds_valid_json():
    markers = [{"lat": 39.9, "lng": 116.4, "cls": "good"}]
    page = map_page(markers, (39.9, 116.4), "beijing")
    m = re.search(r"const D = (\{.*?\});", page, re.S)
    data = json.loads(m.group(1))
    assert data["markers"] == markers
    assert "good" in data["colors"]


def test_heatmap_page_embeds_points():
    pts = [{"lng": 116.0, "lat": 39.0, "count": 5}]
    page = heatmap_page(pts)
    m = re.search(r"const pts = (\[.*?\]);", page, re.S)
    assert json.loads(m.group(1)) == pts
