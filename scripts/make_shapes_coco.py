#!/usr/bin/env python
"""Generate a miniature REAL-PROTOCOL COCO dataset ("shapes-COCO") on disk.

COCO2017 is not available in this environment, so end-to-end COCO-suite runs
(detection AND instance segmentation) use this stand-in: real JPEG files +
real COCO instances JSON (bbox xywh + polygon segmentations + categories) in
the exact layout `RegisterCOCO` consumes
(<root>/annotations/instances_{split}.json + <root>/{split}/):

    train2017 / val2017, plus train2014 mirrored from train2017 (the shipped
    COCO configs use `coco_train_2014` as the classifier stream).

Each of the 80 COCO class names maps to a distinctive (shape, hue) pair
(5 polygonal shapes x 16 hues).  Shapes are DRAWN as the same polygons that
are annotated, so segmentation GT is pixel-exact.

Usage:
  python scripts/make_shapes_coco.py --root /root/data/shapes_coco \
      --train-images 300 --val-images 60 --size 320
"""

import argparse
import colorsys
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unit_tpu.models.similarity import COCO_CLASSES  # noqa: E402

_SHAPES = ["circle", "square", "triangle", "star", "bar"]


def _hue_rgb(k: int, n: int = 16):
    r, g, b = colorsys.hsv_to_rgb(k / n, 0.85, 0.85)
    return int(r * 255), int(g * 255), int(b * 255)


CLASS_STYLE = {
    name: (_SHAPES[i % 5], _hue_rgb(i // 5)) for i, name in enumerate(COCO_CLASSES)
}


def shape_polygon(shape, x1, y1, x2, y2):
    """Polygon(s) for a shape inside the box — list of [x0,y0,x1,y1,...]."""
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    w, h = x2 - x1, y2 - y1
    if shape == "circle":  # 16-gon ellipse approximation
        pts = [
            (cx + w / 2 * np.cos(a), cy + h / 2 * np.sin(a))
            for a in np.linspace(0, 2 * np.pi, 16, endpoint=False)
        ]
        return [pts]
    if shape == "square":
        return [[(x1, y1), (x2, y1), (x2, y2), (x1, y2)]]
    if shape == "triangle":
        return [[(cx, y1), (x2, y2), (x1, y2)]]
    if shape == "star":
        pts = []
        for k in range(10):
            ang = -np.pi / 2 + k * np.pi / 5
            r = (w / 2) if k % 2 == 0 else (w / 5)
            pts.append((cx + r * np.cos(ang), cy + r * np.sin(ang) * h / w))
        return [pts]
    if shape == "bar":  # plus sign: two rectangles (multi-polygon annotation)
        return [
            [(x1, cy - h / 6), (x2, cy - h / 6), (x2, cy + h / 6), (x1, cy + h / 6)],
            [(cx - w / 6, y1), (cx + w / 6, y1), (cx + w / 6, y2), (cx - w / 6, y2)],
        ]
    raise ValueError(shape)


def make_image(rng, size, class_idxs):
    from PIL import Image, ImageDraw

    bg = rng.randint(90, 170, (size // 16, size // 16, 3)).astype(np.uint8)
    img = Image.fromarray(bg).resize((size, size), Image.BILINEAR)
    draw = ImageDraw.Draw(img)
    for _ in range(6):
        gx, gy = rng.randint(0, size - 12, 2)
        gw = rng.randint(6, 18)
        g = int(rng.randint(60, 200))
        draw.ellipse([gx, gy, gx + gw, gy + gw], fill=(g, g, g))

    annos = []
    occupied = []
    for ci in class_idxs:
        shape, color = CLASS_STYLE[COCO_CLASSES[ci]]
        for _ in range(40):
            s = rng.randint(size // 6, size // 3)
            bx1 = rng.randint(2, size - s - 2)
            by1 = rng.randint(2, size - s - 2)
            bx2, by2 = bx1 + s, min(by1 + int(s * rng.uniform(0.7, 1.3)), size - 2)
            if all(bx2 < ox1 or bx1 > ox2 or by2 < oy1 or by1 > oy2
                   for ox1, oy1, ox2, oy2 in occupied):
                break
        occupied.append((bx1, by1, bx2, by2))
        jitter = rng.randint(-20, 20, 3)
        c = tuple(int(np.clip(color[i] + jitter[i], 0, 255)) for i in range(3))
        polys = shape_polygon(shape, bx1, by1, bx2, by2)
        for pts in polys:
            draw.polygon([(float(x), float(y)) for x, y in pts], fill=c,
                         outline=(0, 0, 0))
        seg = [[float(v) for xy in pts for v in xy] for pts in polys]
        xs = [x for pts in polys for x, _ in pts]
        ys = [y for pts in polys for _, y in pts]
        x1b, y1b = max(min(xs), 0.0), max(min(ys), 0.0)
        wb, hb = min(max(xs), size) - x1b, min(max(ys), size) - y1b
        annos.append({
            "category_id": int(ci) + 1,  # COCO ids arbitrary; 1-based here
            "bbox": [x1b, y1b, wb, hb],
            "area": wb * hb / 2.0,
            "iscrowd": 0,
            "segmentation": seg,
        })
    return img, annos


def write_split(root, split, n_images, rng, size):
    img_dir = os.path.join(root, split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = i + 1
        fname = f"{split}_{img_id:06d}.jpg"
        k = rng.randint(1, 4)
        class_idxs = rng.choice(80, size=k, replace=False)
        img, annos = make_image(rng, size, class_idxs)
        img.save(os.path.join(img_dir, fname), quality=90)
        images.append({"id": img_id, "file_name": fname,
                       "width": size, "height": size})
        for a in annos:
            a = dict(a)
            a["id"] = ann_id
            a["image_id"] = img_id
            ann_id += 1
            annotations.append(a)
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i + 1, "name": n} for i, n in enumerate(COCO_CLASSES)
        ],
    }
    with open(os.path.join(root, "annotations", f"instances_{split}.json"), "w") as f:
        json.dump(data, f)
    return len(images), len(annotations)


def write_appearance_embeddings(path: str):
    """[80, 300] class embeddings that ENCODE the synthetic appearance.

    The real GloVe table keys on natural-language class names, which have no
    relation to the synthetic (shape, hue) appearance — for shapes-COCO the
    lingual term of the base->novel similarity is therefore pure noise (the
    round-2 zero-shot novel_mean ~6 diagnosis, BASELINE.md).  These
    embeddings give the lingual term real signal: shape one-hot + a hue
    circle, so lingual similarity ~ appearance similarity.

    The x4 scale matters: similarity_matrices softmaxes the novel@base dot
    products over the 60 base classes, and GloVe dots reach ~35 (mean top-1
    softmax mass 0.81).  Unit-scale appearance dots live in [-1, 2], whose
    softmax is near-uniform (top-1 mass 0.07) — the transfer smears over all
    base classes and novel AP measures exactly 0 (run log in BASELINE.md).
    Scaling by 4 puts dots in [-16, 31] (top-1 mass 0.72, entropy 0.51 vs
    GloVe's 0.53), concentrating transfer on the same-shape nearest-hue base
    classes.
    """
    emb = np.zeros((80, 300), np.float32)
    for i in range(80):
        emb[i, i % 5] = 1.0                       # shape one-hot
        theta = 2.0 * np.pi * (i // 5) / 16.0     # hue circle
        emb[i, 5] = np.cos(theta)
        emb[i, 6] = np.sin(theta)
    np.savez(path, embeddings=emb * 4.0)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train-images", type=int, default=300)
    ap.add_argument("--val-images", type=int, default=60)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument(
        "--emit-embeddings", default=None, metavar="NPZ",
        help="also write appearance-aligned class embeddings (pass the file "
             "to MODEL.ROI_HEADS.EMBEDDING_PATH to give the lingual "
             "similarity term real signal on synthetic classes)",
    )
    args = ap.parse_args()
    if args.emit_embeddings:
        write_appearance_embeddings(args.emit_embeddings)
        print(f"appearance embeddings -> {args.emit_embeddings}")

    if args.train_images <= 0 and args.val_images <= 0:
        return  # embeddings-only invocation: never clobber existing datasets

    rng = np.random.RandomState(args.seed)
    nt, at = write_split(args.root, "train2017", args.train_images, rng, args.size)
    nv, av = write_split(args.root, "val2017", args.val_images, rng, args.size)
    # classifier stream config key uses train2014: mirror via symlinks
    t14 = os.path.join(args.root, "train2014")
    if not os.path.exists(t14):
        # sibling-relative target: a cwd-relative path here would dangle the
        # moment the link is resolved from inside args.root
        os.symlink("train2017", t14)
    a14 = os.path.join(args.root, "annotations", "instances_train2014.json")
    if not os.path.exists(a14):
        os.symlink("instances_train2017.json", a14)
    print(f"shapes-COCO at {args.root}: train {nt} imgs/{at} annos, "
          f"val {nv} imgs/{av} annos")


if __name__ == "__main__":
    main()
