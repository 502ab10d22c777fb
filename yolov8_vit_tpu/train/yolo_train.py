"""YOLOv8 fine-tuning: dataset, train loop, val, and retrain orchestration.

Replaces the reference's delegation to ultralytics
(`/root/reference/utils/trainYolo.py`):

  train(epochs, batch, data)   pre-train val + fine-tune with lr0=lrf=1e-4
                               (:6-35) — here a jitted, shardable train step
                               over the YOLOv8 flax model with the native
                               TAL+CIoU+DFL loss (train/yolo_loss.py)
  yoloRetrain()                xml2txt -> train(1, 1, yolo config) (:124-137)
  validate(...)                model.val parity: decode + NMS at
                               imgsz 640 / conf .25 / IoU .6, mAP50-95

The dataset reads the fold0/{images,labels}/{train,val} layout produced by
data.voc.xml2txt, letterboxes to the train size, and pads labels to a
static `max_gt` for jit."""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator

import numpy as np
import jax
import jax.numpy as jnp
import optax

from yolov8_vit_tpu.config import DetectConfig
from yolov8_vit_tpu.models.yolov8 import (YOLOv8, detect_spec,
                                          flatten_head_outputs)
from yolov8_vit_tpu.runtime.detector import decode_predictions
from yolov8_vit_tpu.runtime.engine import Engine, save_engine
from yolov8_vit_tpu.serve.infer import _letterbox_host
from yolov8_vit_tpu.train.map_eval import evaluate_map
from yolov8_vit_tpu.train.yolo_loss import yolo_detection_loss


# --------------------------------------------------------------------------
# augmentations (the `model.train()` recipe the reference delegates to
# ultralytics for, `/root/reference/utils/trainYolo.py:33`)
# --------------------------------------------------------------------------

def augment_hsv(img: np.ndarray, rng: np.random.Generator,
                hgain: float = 0.015, sgain: float = 0.7,
                vgain: float = 0.4) -> np.ndarray:
    """Random HSV jitter with the ultralytics default gains, LUT-applied.
    RGB uint8 in/out; identity when all gains are 0."""
    import cv2
    if hgain == sgain == vgain == 0:
        return img
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=np.float32)
    lut_h = ((x * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * r[2], 0, 255).astype(np.uint8)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                     cv2.LUT(val, lut_v)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def random_affine(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                  rng: np.random.Generator, out_size: int,
                  degrees: float = 0.0, translate: float = 0.1,
                  scale: float = 0.5):
    """Random scale/translate(/rotate) mapping img -> (out_size, out_size).

    The yolov8 train default is degrees=0, translate=.1, scale=.5: sample
    s in [1-scale, 1+scale] and a shift of +/-translate*out_size, warp the
    image (border fill 114), transform box corners with the same matrix,
    clip, and drop degenerate candidates (w/h < 2px or area shrunk < 10%).
    Returns (img (out,out,3) f32 [0,1]-scaled like _load, boxes, labels).
    """
    import cv2
    h, w = img.shape[:2]
    s = rng.uniform(1 - scale, 1 + scale)
    a = np.deg2rad(rng.uniform(-degrees, degrees)) if degrees else 0.0
    cx, cy = w / 2, h / 2
    cos, sin = np.cos(a) * s, np.sin(a) * s
    tx = rng.uniform(0.5 - translate, 0.5 + translate) * out_size
    ty = rng.uniform(0.5 - translate, 0.5 + translate) * out_size
    m = np.array([[cos, -sin, tx - cos * cx + sin * cy],
                  [sin, cos, ty - sin * cx - cos * cy]], np.float32)
    src = img if img.dtype == np.uint8 else \
        np.clip(img * 255.0, 0, 255).astype(np.uint8)
    warped = cv2.warpAffine(src, m, (out_size, out_size),
                            borderValue=(114, 114, 114))
    if len(boxes):
        corners = np.concatenate([
            boxes[:, [0, 1]], boxes[:, [2, 1]],
            boxes[:, [0, 3]], boxes[:, [2, 3]]], 0)          # (4n, 2)
        corners = corners @ m[:, :2].T + m[:, 2]
        corners = corners.reshape(4, -1, 2)
        new = np.concatenate([corners.min(0), corners.max(0)],
                             1).astype(np.float32)           # (n, 4)
        clipped = new.copy()
        clipped[:, [0, 2]] = clipped[:, [0, 2]].clip(0, out_size)
        clipped[:, [1, 3]] = clipped[:, [1, 3]].clip(0, out_size)
        wh_new = clipped[:, 2:] - clipped[:, :2]
        area_pre = ((boxes[:, 2] - boxes[:, 0]) *
                    (boxes[:, 3] - boxes[:, 1])) * s * s
        keep = (wh_new > 2).all(1) & \
            (wh_new[:, 0] * wh_new[:, 1] > 0.1 * np.maximum(area_pre, 1e-9))
        boxes, labels = clipped[keep], labels[keep]
    return warped.astype(np.float32) / 255.0, boxes, labels


# --------------------------------------------------------------------------
# dataset
# --------------------------------------------------------------------------

@dataclasses.dataclass
class YoloDataset:
    """fold0-layout dataset -> letterboxed batches with padded labels."""

    root: str                      # .../fold0
    split: str = "train"
    img_size: int = 640
    max_gt: int = 32
    # train-time recipe knobs (ultralytics model.train defaults)
    hsv: tuple = (0.015, 0.7, 0.4)
    translate: float = 0.1
    scale: float = 0.5
    degrees: float = 0.0

    def __post_init__(self):
        img_dir = os.path.join(self.root, "images", self.split)
        self.items = []
        if os.path.isdir(img_dir):
            for f in sorted(os.listdir(img_dir)):
                stem = os.path.splitext(f)[0]
                lbl = os.path.join(self.root, "labels", self.split,
                                   stem + ".txt")
                if os.path.exists(lbl):
                    self.items.append((os.path.join(img_dir, f), lbl))

    def __len__(self):
        return len(self.items)

    def _load(self, idx: int, augment: bool, rng: np.random.Generator):
        from PIL import Image
        path, lbl = self.items[idx]
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
        h, w = img.shape[:2]
        rows = np.loadtxt(lbl, ndmin=2, dtype=np.float32)
        if rows.size == 0:
            rows = np.zeros((0, 5), np.float32)
        labels = rows[:, 0].astype(np.int32)
        cxcywh = rows[:, 1:]
        boxes = np.stack([(cxcywh[:, 0] - cxcywh[:, 2] / 2) * w,
                          (cxcywh[:, 1] - cxcywh[:, 3] / 2) * h,
                          (cxcywh[:, 0] + cxcywh[:, 2] / 2) * w,
                          (cxcywh[:, 1] + cxcywh[:, 3] / 2) * h], -1) \
            if len(cxcywh) else np.zeros((0, 4), np.float32)

        if augment and rng.random() < 0.5:          # horizontal flip
            img = img[:, ::-1]
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if augment:                                  # HSV color jitter
            img = augment_hsv(np.ascontiguousarray(img), rng, *self.hsv)

        # _letterbox_host is channel-agnostic (resize + gray-114 pad), so
        # RGB goes straight through — no BGR round-trip copies
        lb_img, ratio, (dw, dh) = _letterbox_host(
            img, (self.img_size, self.img_size))
        boxes = boxes * ratio + np.array([dw, dh, dw, dh], np.float32)

        g = min(len(boxes), self.max_gt)
        pad_boxes = np.zeros((self.max_gt, 4), np.float32)
        pad_labels = np.zeros((self.max_gt,), np.int32)
        pad_mask = np.zeros((self.max_gt,), bool)
        pad_boxes[:g] = boxes[:g]
        pad_labels[:g] = labels[:g]
        pad_mask[:g] = True
        return (lb_img.astype(np.float32) / 255.0, pad_boxes, pad_labels,
                pad_mask)

    def _mosaic(self, idx: int, rng: np.random.Generator):
        """4-image mosaic + random affine (ultralytics' default train-time
        pipeline, part of what `model.train()` does internally): four
        letterboxed images tile a 2S canvas, then a random scale/translate
        affine maps the canvas to S with boxes remapped; degenerate or
        mostly-cropped boxes drop."""
        s = self.img_size
        picks = [idx] + [int(rng.integers(0, len(self.items)))
                         for _ in range(3)]
        canvas = np.zeros((2 * s, 2 * s, 3), np.float32)
        boxes_all, labels_all = [], []
        for q, i in enumerate(picks):
            img, bx, lb, mk = self._load(i, True, rng)
            oy, ox = (q // 2) * s, (q % 2) * s
            canvas[oy:oy + s, ox:ox + s] = img
            valid = bx[mk]
            if len(valid):
                shifted = valid + np.array([ox, oy, ox, oy], np.float32)
                boxes_all.append(shifted)
                labels_all.append(lb[mk])
        if boxes_all:
            boxes = np.concatenate(boxes_all)
            labels = np.concatenate(labels_all)
        else:
            boxes = np.zeros((0, 4), np.float32)
            labels = np.zeros((0,), np.int32)
        # scale=1 shows the canvas center 1:1 (an S-crop of the 2S mosaic),
        # matching ultralytics' random_perspective(border=-S/2) semantics
        canvas, boxes, labels = random_affine(
            canvas, boxes, labels, rng, s, degrees=self.degrees,
            translate=self.translate, scale=self.scale)
        g = min(len(boxes), self.max_gt)
        pb = np.zeros((self.max_gt, 4), np.float32)
        pl = np.zeros((self.max_gt,), np.int32)
        pm = np.zeros((self.max_gt,), bool)
        pb[:g], pl[:g], pm[:g] = boxes[:g], labels[:g], True
        return canvas.astype(np.float32), pb, pl, pm

    def batches(self, batch_size: int, augment: bool = False,
                seed: int = 0, mosaic: float = 1.0,
                drop_last: bool = True) -> Iterator[tuple]:
        """drop_last=True (training) skips the tail partial batch; eval must
        pass drop_last=False so metrics cover every image."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.items)) if augment else \
            np.arange(len(self.items))
        stop = len(order) - batch_size + 1 if drop_last else len(order)
        for s in range(0, max(stop, 0 if drop_last else 1), batch_size):
            idxs = order[s:s + batch_size]
            if len(idxs) == 0:
                break
            chunk = []
            for i in idxs:
                if augment and rng.random() < mosaic and len(self.items) >= 4:
                    chunk.append(self._mosaic(int(i), rng))
                else:
                    chunk.append(self._load(int(i), augment, rng))
            yield tuple(np.stack([c[j] for c in chunk]) for j in range(4))


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def make_yolo_train_step(model: YOLOv8, tx, input_hw, reg_max=16, mesh=None,
                         strides=(8, 16, 32)):
    """Jitted (optionally data-sharded) YOLO train step.

    `strides` must match the model head's (the loss builds its anchor grid
    from them; a mismatch desynchronizes anchors from the flattened head).

    With a mesh, batch arrays shard over the `data` axis and params/opt
    state replicate — the XLA partitioner inserts the gradient psums
    (no hand-written sync, unlike a DDP port would need)."""
    def step(params, opt_state, imgs, boxes, labels, mask):
        def loss_fn(p):
            bd, cl = flatten_head_outputs(model.apply(p, imgs))
            total, parts = yolo_detection_loss(bd, cl, boxes, labels, mask,
                                               input_hw, strides=strides,
                                               reg_max=reg_max)
            return total, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(rep, rep, data, data, data, data),
                   out_shardings=(rep, rep, rep,
                                  {"box": rep, "cls": rep, "dfl": rep}))


def validate(model: YOLOv8, params, dataset: YoloDataset,
             cfg: DetectConfig, batch_size: int = 16,
             conf: float = 0.25) -> dict:
    """model.val-parity evaluation: decode+NMS then mAP
    (imgsz 640, batch 16, conf .25 — `/root/reference/utils/trainYolo.py:21-26`)."""
    fn = jax.jit(lambda p, x: decode_predictions(model.apply(p, x), cfg))
    preds, gts = [], []
    for imgs, boxes, labels, mask in dataset.batches(
            min(batch_size, max(len(dataset), 1)), drop_last=False):
        num, bb, sc, lb = jax.tree.map(np.asarray,
                                       fn(params, jnp.asarray(imgs)))
        for i in range(len(imgs)):
            n = int(num[i])
            preds.append({"boxes": bb[i][:n], "scores": sc[i][:n],
                          "labels": lb[i][:n]})
            m = mask[i]
            gts.append({"boxes": boxes[i][m], "labels": labels[i][m]})
    return evaluate_map(preds, gts, cfg.num_classes, conf_threshold=conf)


def make_lr_schedule(lr0: float, lrf: float, total_steps: int,
                     warmup_steps: int, cos_lr: bool = False):
    """ultralytics LR shape: linear warmup over `warmup_steps`, then linear
    decay lr0 -> lr0*lrf over the run (cosine one-cycle when cos_lr).  The
    reference passes lr0 == lrf*lr0 -> flat after warmup
    (`/root/reference/utils/trainYolo.py:33`)."""
    def sched(count):
        c = jnp.asarray(count, jnp.float32)
        if warmup_steps > 0:
            w = jnp.minimum((c + 1.0) / float(warmup_steps), 1.0)
        else:
            w = 1.0
        frac = jnp.clip(c / max(float(total_steps), 1.0), 0.0, 1.0)
        if cos_lr:
            decay = lrf + (1.0 - lrf) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            decay = (1.0 - frac) * (1.0 - lrf) + lrf
        return lr0 * w * decay
    return sched


# --------------------------------------------------------------------------
# ultralytics-parity optimizer: three param groups + per-group warmup
# --------------------------------------------------------------------------

def param_group_label(path: tuple, leaf) -> str:
    """ultralytics `build_optimizer` partition
    (the `model.train()` optimizer the reference delegates to at
    `/root/reference/utils/trainYolo.py:33`):

      'bias'   all bias vectors                       -> no decay, bias warmup
      'norm'   BatchNorm/LayerNorm scale parameters   -> no decay
      'weight' conv/linear kernels                    -> weight decay

    `path` is a tuple of str pytree keys (flax param path), leaf the array.
    """
    name = str(path[-1]) if path else ""
    if name == "bias":
        return "bias"
    modname = str(path[-2]) if len(path) >= 2 else ""
    if name == "scale" or modname in ("bn", "norm"):
        return "norm"
    if getattr(leaf, "ndim", 0) >= 2:
        return "weight"
    return "norm"      # any other 1-D param (e.g. LN bias handled above)


def make_yolo_optimizer(lr0: float, lrf: float, epochs: int,
                        steps_per_epoch: int, warmup_steps: int,
                        cos_lr: bool = False, weight_decay: float = 5e-4,
                        momentum: float = 0.937,
                        warmup_momentum: float = 0.8,
                        warmup_bias_lr: float = 0.1):
    """optax transform matching ultralytics SGD semantics per-update:

      * decay ONLY on the 'weight' group (conv/linear kernels); BatchNorm
        scales and every bias are decay-free;
      * warmup (first `warmup_steps` batches): bias LR ramps DOWN from
        `warmup_bias_lr` to lr(epoch), other groups ramp up from 0;
        momentum ramps `warmup_momentum` -> `momentum`;
      * global grad-norm clip at 10.0 BEFORE decay/momentum (ultralytics
        BaseTrainer.optimizer_step clips every step; essential stability
        partner of the loss's `* batch_size` scale);
      * nesterov momentum, torch update order (decay added to the gradient
        before the momentum buffer, update = g + mu*v);
      * per-EPOCH decay factor lf(epoch) = (1-e/E)*(1-lrf)+lrf (stairstep,
        not per-step — ultralytics evaluates `self.lf(epoch)`), cosine
        one-cycle when cos_lr.

    Pinned numerically against torch.optim.SGD with the ultralytics group
    construction + clip_grad_norm_ in tests/test_yolo_optimizer.py.
    """
    import optax as _optax

    def lf(epoch):
        frac = jnp.asarray(epoch, jnp.float32) / max(float(epochs), 1.0)
        if cos_lr:
            return lrf + (1.0 - lrf) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return (1.0 - frac) * (1.0 - lrf) + lrf

    def interp(ni, y0, y1):
        """np.interp(ni, [0, nw], [y0, y1]) with clamping."""
        if warmup_steps <= 0:
            return y1
        t = jnp.clip(jnp.asarray(ni, jnp.float32) / float(warmup_steps),
                     0.0, 1.0)
        return y0 + (y1 - y0) * t

    def init(params):
        return {"count": jnp.zeros((), jnp.int32),
                "trace": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params):
        if params is None:
            raise ValueError("make_yolo_optimizer requires params")
        ni = state["count"]
        # torch.nn.utils.clip_grad_norm_(max_norm=10): coef = 10/(norm+eps),
        # applied only when < 1
        gnorm = _optax.global_norm(grads)
        clip = jnp.minimum(1.0, 10.0 / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * clip, grads)
        epoch = (ni // max(steps_per_epoch, 1)).astype(jnp.float32)
        base = lr0 * lf(epoch)
        lr_w = interp(ni, 0.0, base)
        lr_b = interp(ni, warmup_bias_lr, base)
        mu = interp(ni, warmup_momentum, momentum)

        labels = jax.tree_util.tree_map_with_path(
            lambda p, l: param_group_label(
                tuple(getattr(k, "key", getattr(k, "idx", k)) for k in p), l),
            params)

        def leaf_update(label, g, v, p):
            g = g + weight_decay * p if label == "weight" else g
            v_new = mu * v + g
            upd = g + mu * v_new                     # nesterov
            lr = lr_b if label == "bias" else lr_w
            return -lr * upd, v_new

        flat = jax.tree.map(leaf_update, labels, grads, state["trace"], params)
        updates = jax.tree.map(lambda x: x[0], flat,
                               is_leaf=lambda x: isinstance(x, tuple))
        trace = jax.tree.map(lambda x: x[1], flat,
                             is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"count": ni + 1, "trace": trace}

    return _optax.GradientTransformation(init, update)


def train(epochs: int, batch: int, data_root: str,
          cfg: DetectConfig = DetectConfig(variant="s"),
          lr0: float = 1e-4, weights: str | None = None,
          max_gt: int = 32, log_fn: Callable[[str], None] = print,
          skip_preval: bool = False, use_ema: bool = True, mesh=None,
          lrf: float = 1.0, cos_lr: bool = False,
          warmup_epochs: float = 3.0, multi_scale: bool = False,
          augment: bool = True, mosaic: float = 1.0):
    """Fine-tune (reference train(), `/root/reference/utils/trainYolo.py:6-35`).

    data_root: the fold0 directory (images/labels x train/val).
    weights: detect-engine dir to resume from (reference resumes best.pt).
    lrf/cos_lr/warmup_epochs/multi_scale mirror the ultralytics
    `model.train()` knobs the reference delegates to; the reference's
    lr0=lrf=1e-4 call maps to lrf=1.0 (flat schedule).  multi_scale
    resizes each batch to a random factor in {0.75, 1, 1.25} (each size
    compiles once and is cached).
    Returns (params, {"preval": ..., "final": ...}).
    """
    model = YOLOv8(detect_spec(cfg), fused=True)
    size = cfg.input_size[0]
    if weights and os.path.isdir(weights):
        params = Engine(weights).params
        log_fn(f"resumed from {weights}")
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))

    train_ds = YoloDataset(data_root, "train", size, max_gt)
    val_ds = YoloDataset(data_root, "val", size, max_gt)
    metrics = {}
    if len(val_ds) and not skip_preval:
        metrics["preval"] = validate(model, params, val_ds, cfg)
        log_fn(f"val before training: {metrics['preval']}")

    # ultralytics-parity SGD: 3 param groups (decay only on conv/linear
    # weights; BN scale + all biases decay-free), bias-LR + momentum warmup
    # ramps, nesterov, per-epoch stairstep decay (reference lr0=lrf -> flat
    # after warmup)
    steps_per_epoch = max(len(train_ds) // max(batch, 1), 1)
    warmup_steps = (max(round(warmup_epochs * steps_per_epoch), 100)
                    if warmup_epochs > 0 else 0)
    tx = make_yolo_optimizer(lr0, lrf, epochs, steps_per_epoch,
                             warmup_steps, cos_lr)
    opt_state = tx.init(params)
    steps = {cfg.input_size[0]: make_yolo_train_step(
        model, tx, cfg.input_size, cfg.reg_max, mesh=mesh,
        strides=cfg.strides)}

    from yolov8_vit_tpu.train.ema import EMA
    ema = EMA(params) if use_ema else None
    ms_rng = np.random.default_rng(0)
    for epoch in range(epochs):
        losses = []
        for imgs, boxes, labels, mask in train_ds.batches(
                batch, augment=augment, seed=epoch, mosaic=mosaic):
            sz = size
            if multi_scale:
                sz = int(round(size * ms_rng.choice((0.75, 1.0, 1.25))
                               / 64) * 64)
            if sz != size:
                imgs_d = jax.image.resize(
                    jnp.asarray(imgs), (imgs.shape[0], sz, sz, 3),
                    "bilinear")
                boxes_d = jnp.asarray(boxes) * (sz / size)
                if sz not in steps:
                    steps[sz] = make_yolo_train_step(
                        model, tx, (sz, sz), cfg.reg_max, mesh=mesh,
                        strides=cfg.strides)
            else:
                imgs_d, boxes_d = jnp.asarray(imgs), jnp.asarray(boxes)
            params, opt_state, loss, parts = steps[sz](
                params, opt_state, imgs_d, boxes_d,
                jnp.asarray(labels), jnp.asarray(mask))
            if ema is not None:
                ema.update(params)
            losses.append(float(loss))
        log_fn(f"epoch {epoch + 1}/{epochs}: "
               f"loss {np.mean(losses) if losses else float('nan'):.4f}")

    # ultralytics validates/exports the EMA weights
    final_params = ema.params if (ema is not None and ema.updates) else params
    if len(val_ds):
        metrics["final"] = validate(model, final_params, val_ds, cfg)
        log_fn(f"val after training: {metrics['final']}")
    return final_params, metrics


def yolo_retrain(workdir: str = ".", cfg: DetectConfig = DetectConfig(variant="s"),
                 epochs: int = 1, batch: int = 1,
                 log_fn: Callable[[str], None] = print):
    """`yoloRetrain` parity (`/root/reference/utils/trainYolo.py:124-137`):
    convert train/new XMLs, fine-tune, export the detect engine."""
    from yolov8_vit_tpu.data.voc import xml2txt

    fold = os.path.join(workdir, "train/yolo/fold0")
    n = xml2txt(os.path.join(workdir, "train/new"), fold)
    log_fn(f"converted {n} annotations")
    weights = os.path.join(workdir, "weights/detect_engine")
    params, metrics = train(epochs, batch, fold, cfg,
                            weights=weights if os.path.isdir(weights) else None,
                            log_fn=log_fn)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["input_size"] = list(cfg_dict["input_size"])
    cfg_dict["strides"] = list(cfg_dict["strides"])
    save_engine(weights, "detect", params, {"detect_cfg": cfg_dict})
    log_fn("detect engine exported")
    return metrics
