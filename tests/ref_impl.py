"""Pure-NumPy oracle implementations used as parity targets in tests.

These re-state the reference semantics (classic Faster R-CNN / R-FCN
numerics, see SURVEY.md section 4) as slow, obviously-correct loops; the
jittable ops in lsfa_tpu must match them exactly (or to float tolerance).
"""

import math

import numpy as np


def ref_nms(dets, thresh):
    """Greedy NMS oracle (parity: lib/nms/nms.py:37-74)."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(dets), dtype=bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            xx1 = max(x1[i], x1[j]); yy1 = max(y1[i], y1[j])
            xx2 = min(x2[i], x2[j]); yy2 = min(y2[i], y2[j])
            iw = max(0.0, xx2 - xx1 + 1); ih = max(0.0, yy2 - yy1 + 1)
            inter = iw * ih
            ovr = inter / (areas[i] + areas[j] - inter)
            if ovr > thresh:
                suppressed[j] = True
    return keep


def ref_bbox_pred(boxes, deltas):
    """Delta decoding oracle (parity: lib/bbox/bbox_transform.py:103-140)."""
    boxes = boxes.astype(np.float64)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * (w - 1.0)
    cy = boxes[:, 1] + 0.5 * (h - 1.0)
    out = np.zeros_like(deltas, dtype=np.float64)
    for k in range(deltas.shape[1] // 4):
        dx, dy, dw, dh = (deltas[:, 4 * k + i] for i in range(4))
        pcx = dx * w + cx
        pcy = dy * h + cy
        pw = np.exp(dw) * w
        ph = np.exp(dh) * h
        out[:, 4 * k + 0] = pcx - 0.5 * (pw - 1.0)
        out[:, 4 * k + 1] = pcy - 0.5 * (ph - 1.0)
        out[:, 4 * k + 2] = pcx + 0.5 * (pw - 1.0)
        out[:, 4 * k + 3] = pcy + 0.5 * (ph - 1.0)
    return out


def ref_iou_matrix(a, b):
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + 1
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + 1
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = ((a[i, 2] - a[i, 0] + 1) * (a[i, 3] - a[i, 1] + 1)
                      + (b[j, 2] - b[j, 0] + 1) * (b[j, 3] - b[j, 1] + 1) - inter)
                out[i, j] = inter / ua
    return out


def ref_psroi_pool(feat_chw, rois, output_dim, group_size, pooled_size, spatial_scale):
    """Loop oracle for PSROIPooling (parity: psroi_pooling.cu:32-101).

    feat_chw: (C, H, W); rois: (N, 5). Returns (N, output_dim, P, P)."""
    c, height, width = feat_chw.shape
    n = len(rois)
    g, p = group_size, pooled_size
    out = np.zeros((n, output_dim, p, p), dtype=np.float64)
    def c_round(x):
        # C round(): halves away from zero (python/np round are half-even)
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    for i in range(n):
        xs = c_round(rois[i, 1]) * spatial_scale
        ys = c_round(rois[i, 2]) * spatial_scale
        xe = (c_round(rois[i, 3]) + 1.0) * spatial_scale
        ye = (c_round(rois[i, 4]) + 1.0) * spatial_scale
        rw = max(xe - xs, 0.1)
        rh = max(ye - ys, 0.1)
        bh, bw = rh / p, rw / p
        for ctop in range(output_dim):
            for ph in range(p):
                for pw in range(p):
                    hs = int(np.floor(ph * bh + ys))
                    he = int(np.ceil((ph + 1) * bh + ys))
                    ws = int(np.floor(pw * bw + xs))
                    we = int(np.ceil((pw + 1) * bw + xs))
                    hs, he = min(max(hs, 0), height), min(max(he, 0), height)
                    ws, we = min(max(ws, 0), width), min(max(we, 0), width)
                    if he <= hs or we <= ws:
                        continue
                    gh = min(max(ph * g // p, 0), g - 1)
                    gw = min(max(pw * g // p, 0), g - 1)
                    ch = (ctop * g + gh) * g + gw
                    patch = feat_chw[ch, hs:he, ws:we]
                    out[i, ctop, ph, pw] = patch.sum() / ((he - hs) * (we - ws))
    return out


def ref_flow_warp(feat_chw, flow_2hw):
    """Bilinear warp oracle with zero padding (GridGenerator+BilinearSampler).

    feat_chw: (C, H, W); flow: (2, H, W) [dx, dy]. Returns (C, H, W)."""
    c, h, w = feat_chw.shape
    out = np.zeros_like(feat_chw, dtype=np.float64)
    for y in range(h):
        for x in range(w):
            sx = x + flow_2hw[0, y, x]
            sy = y + flow_2hw[1, y, x]
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            for dy in (0, 1):
                for dx in (0, 1):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy <= h - 1 and 0 <= xx <= w - 1:
                        wgt = ((1 - abs(sx - xx)) * (1 - abs(sy - yy)))
                        out[:, y, x] += wgt * feat_chw[:, yy, xx]
    return out
