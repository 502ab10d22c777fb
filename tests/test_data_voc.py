"""VOC XML writer/reader + YOLO conversion + deliver round-trips."""
import os
import random

import numpy as np
from PIL import Image

from yolov8_vit_tpu.data import (generate_annotation, parse_voc_xml,
                                 scan_xml_dirs, convert_box_cxcywh, xml2txt,
                                 deliver)


def test_annotation_roundtrip(tmp_path):
    objs = [{"sort": "good", "xmin": 10, "ymin": 20, "xmax": 110, "ymax": 140},
            {"sort": 4, "xmin": 5, "ymin": 6, "xmax": 50, "ymax": 60}]
    out = generate_annotation("fold", "img1.jpg", "img1.jpg", objs,
                              save_dir=str(tmp_path), image_size=(640, 480))
    assert out and os.path.exists(out)
    rec = parse_voc_xml(out)
    assert rec["name"] == "img1"
    assert rec["width"] == 640 and rec["height"] == 480
    assert [o["label"] for o in rec["objects"]] == [0, 4]
    assert rec["objects"][0]["xmax"] == 110


def test_parse_accepts_name_or_sort_tags(tmp_path):
    xml = """<annotation><filename>a.jpg</filename>
    <size><width>100</width><height>100</height></size>
    <object><name>broke</name><bndbox><xmin>1</xmin><ymin>2</ymin>
    <xmax>3</xmax><ymax>4</ymax></bndbox></object>
    <object><sort>loss</sort><bndbox><xmin>5</xmin><ymin>6</ymin>
    <xmax>7</xmax><ymax>8</ymax></bndbox></object></annotation>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    rec = parse_voc_xml(str(p))
    assert [o["label"] for o in rec["objects"]] == [1, 2]  # loss aliases lose


def test_convert_box():
    x, y, w, h = convert_box_cxcywh((10, 20, 110, 220), 200, 400)
    assert (x, y, w, h) == (0.3, 0.3, 0.5, 0.5)


def _make_labeled_images(d, n=10):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = Image.fromarray(
            np.zeros((60, 80, 3), np.uint8))
        img.save(os.path.join(d, f"img{i}.jpg"))
        generate_annotation("", f"img{i}.jpg", f"img{i}.jpg",
                            [{"sort": "good", "xmin": 1, "ymin": 2,
                              "xmax": 30, "ymax": 40}],
                            save_dir=d, image_size=(80, 60))


def test_xml2txt_layout(tmp_path):
    src = str(tmp_path / "new")
    dst = str(tmp_path / "fold0")
    _make_labeled_images(src, 10)
    n = xml2txt(src, dst, rng=random.Random(0))
    assert n == 10
    txts = []
    for split in ("train", "val"):
        d = os.path.join(dst, "labels", split)
        txts += [os.path.join(d, f) for f in os.listdir(d)]
        assert os.path.isdir(os.path.join(dst, "images", split))
    assert len(txts) == 10
    line = open(txts[0]).read().strip().split()
    assert line[0] == "0" and len(line) == 5
    # normalized cxcywh of (1,2,30,40) in 80x60
    assert abs(float(line[1]) - (1 + 30) / 2 / 80) < 1e-4


def test_deliver_moves_pairs(tmp_path):
    src = str(tmp_path / "new")
    _make_labeled_images(src, 10)
    nt, nv = deliver(src, str(tmp_path / "nt"), str(tmp_path / "nv"),
                     rng=random.Random(1))
    assert nt + nv == 10
    assert len(os.listdir(src)) == 0
    assert len(os.listdir(tmp_path / "nt")) == nt * 2


def test_xml2txt_skips_unknown_labels(tmp_path):
    """An unmapped class name must not reach the txt as label -1 (the TAL
    assigner's gt_labels.clip(0) would alias it to class 0 with an
    all-zero target); the object is skipped with a warning, the rest of
    the image kept.  The reference's writer hard-KeyErrors instead
    (`/root/reference/utils/class_config.py:130`)."""
    import warnings as _warnings
    src = str(tmp_path / "new")
    os.makedirs(src)
    Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(
        os.path.join(src, "img0.jpg"))
    generate_annotation("", "img0.jpg", "img0.jpg",
                        [{"sort": "Mystery", "xmin": 1, "ymin": 2,
                          "xmax": 30, "ymax": 40},
                         {"sort": "good", "xmin": 5, "ymin": 6,
                          "xmax": 20, "ymax": 30}],
                        save_dir=src, image_size=(80, 60))
    dst = str(tmp_path / "fold0")
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        n = xml2txt(src, dst, rng=random.Random(0))
    assert n == 1
    assert any("Mystery" in str(w.message) for w in rec)
    lines = []
    for split in ("train", "val"):
        d = os.path.join(dst, "labels", split)
        for f in os.listdir(d):
            lines += open(os.path.join(d, f)).read().splitlines()
    assert len(lines) == 1                       # the good object only
    assert lines[0].split()[0] == "0"


def test_xml2txt_resplit_leaves_no_stale_files(tmp_path):
    """Each retrain cycle redraws the random 80/20 split; files from a
    prior draw must not survive (the same image in both images/train and
    images/val would train on the validation set)."""
    src = str(tmp_path / "new")
    dst = str(tmp_path / "fold0")
    _make_labeled_images(src, 12)
    xml2txt(src, dst, rng=random.Random(0))
    xml2txt(src, dst, rng=random.Random(7))   # different draw
    for kind in ("images", "labels"):
        names = {split: set(os.listdir(os.path.join(dst, kind, split)))
                 for split in ("train", "val")}
        assert not names["train"] & names["val"], (kind, names)
        assert len(names["train"]) + len(names["val"]) == 12


def test_xml2txt_pairs_label_with_copied_image_stem(tmp_path):
    """A VOC file whose <filename> tag differs from its image path must
    still produce a PAIRED image+label (YoloDataset matches by stem; a
    label under the tag stem next to an image under the path stem was
    silently dropped from training)."""
    src = str(tmp_path / "new")
    os.makedirs(src)
    img = Image.fromarray(np.zeros((60, 80, 3), np.uint8))
    img.save(os.path.join(src, "IMG_4231.jpg"))
    generate_annotation("", "frame_001.jpg", "IMG_4231.jpg",
                        [{"sort": "good", "xmin": 1, "ymin": 2,
                          "xmax": 30, "ymax": 40}],
                        save_dir=src, image_size=(80, 60))
    dst = str(tmp_path / "fold0")
    xml2txt(src, dst, rng=random.Random(0))
    for split in ("train", "val"):
        imgs = {os.path.splitext(f)[0]
                for f in os.listdir(os.path.join(dst, "images", split))}
        lbls = {os.path.splitext(f)[0]
                for f in os.listdir(os.path.join(dst, "labels", split))}
        assert imgs == lbls, (split, imgs, lbls)
