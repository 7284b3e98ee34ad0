"""Detection visualization (reference: lib/utils/show_boxes.py) using PIL
(no cv2/matplotlib dependency in the hot path)."""

from __future__ import annotations

import colorsys

import numpy as np
from PIL import Image, ImageDraw

from lsfa_tpu.data.dataset import CLASS_NAMES


def class_color(idx: int, n: int = 31):
    r, g, b = colorsys.hsv_to_rgb((idx * 0.41) % 1.0, 0.9, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


def draw_detections(image_rgb: np.ndarray, dets: dict,
                    score_thresh: float = 0.3) -> Image.Image:
    """dets: {labels, scores, boxes} (eval.tester.collect_detections)."""
    im = Image.fromarray(image_rgb.astype(np.uint8))
    dr = ImageDraw.Draw(im)
    for lbl, sc, box in zip(dets["labels"], dets["scores"], dets["boxes"]):
        if sc < score_thresh:
            continue
        color = class_color(int(lbl))
        x1, y1, x2, y2 = [float(v) for v in box]
        # decoded boxes can degenerate (predicted width < 1px)
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        dr.rectangle([x1, y1, x2, y2], outline=color, width=2)
        name = CLASS_NAMES[int(lbl)] if int(lbl) < len(CLASS_NAMES) else str(lbl)
        dr.text((x1 + 2, max(y1 - 12, 0)), f"{name} {sc:.2f}", fill=color)
    return im
