"""mAP evaluator sanity + golden checks."""
import numpy as np

from yolov8_vit_tpu.train.map_eval import evaluate_map


def _one(boxes, labels, scores=None):
    d = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
         "labels": np.asarray(labels)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    return d


def test_perfect_predictions_map_1():
    gt = [_one([[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1])]
    pred = [_one([[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1], [0.9, 0.8])]
    m = evaluate_map(pred, gt, num_classes=2)
    assert m["map50"] == 1.0
    assert m["map50_95"] == 1.0


def test_wrong_class_scores_zero():
    gt = [_one([[10, 10, 50, 50]], [0])]
    pred = [_one([[10, 10, 50, 50]], [1], [0.9])]
    m = evaluate_map(pred, gt, num_classes=2)
    assert m["map50"] == 0.0


def test_localization_threshold_behavior():
    """A pred with IoU ~0.55 counts at IoU .5 but not at .95."""
    gt = [_one([[0, 0, 100, 100]], [0])]
    pred = [_one([[0, 0, 100, 73]], [0], [0.9])]   # IoU = .73
    m = evaluate_map(pred, gt, num_classes=1)
    assert m["map50"] == 1.0
    assert m["map50_95"] < 1.0


def test_duplicate_detections_penalized():
    gt = [_one([[10, 10, 50, 50]], [0])]
    pred = [_one([[10, 10, 50, 50], [11, 11, 51, 51]], [0, 0], [0.9, 0.85])]
    m = evaluate_map(pred, gt, num_classes=1)
    # second detection is a FP: precision drops but AP50 (area under PR
    # after reaching recall 1 at precision 1) stays 1.0 in interpolation
    assert m["map50"] == 1.0
    # a non-matching (IoU<0.5) detection ranked FIRST drags precision at
    # every recall level
    pred = [_one([[60, 60, 100, 100], [10, 10, 50, 50]], [0, 0], [0.9, 0.85])]
    m2 = evaluate_map(pred, gt, num_classes=1)
    assert m2["map50"] == 0.5


def test_conf_threshold_filters():
    gt = [_one([[10, 10, 50, 50]], [0])]
    pred = [_one([[10, 10, 50, 50]], [0], [0.1])]
    m = evaluate_map(pred, gt, num_classes=1, conf_threshold=0.25)
    assert m["map50"] == 0.0


def test_absent_class_excluded_from_mean():
    gt = [_one([[10, 10, 50, 50]], [0])]
    pred = [_one([[10, 10, 50, 50]], [0], [0.9])]
    m = evaluate_map(pred, gt, num_classes=5)
    assert m["map50"] == 1.0  # classes 1-4 have no gt: excluded, not zeros
