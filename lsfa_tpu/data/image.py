"""Host-side image / motion-vector / residual preprocessing.

Behavioral target: lib/utils/image.py —
  * resize (:266-294): scale the short side to `target_size` capped so the
    long side stays <= max_size; optional pad-to-stride;
  * transform (:296-308): BGR -> RGB channel flip, mean subtraction, pixel
    scale;
  * transform_mv_res (:202-263): scale MV/residual spatially by im_scale,
    pad to a multiple of the rcnn stride, downsample x1/stride to the
    feature grid, multiply MV values by im_scale/stride (feature-cell
    units), mean-subtract+scale the residual like an image.

TPU redesign: NHWC output (not NCHW), fixed bucket padding (pad every
tensor to a static (H, W) bucket so device programs never recompile), and
PIL/NumPy instead of cv2 (not in the image). The MV negation done by the
reference's loader (image.py:54) lives here in `load_frame_triplet`.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _resize_np(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize of an HxWxC float/uint8 array via PIL per channel."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    chans = []
    for c in range(arr.shape[2]):
        im = Image.fromarray(arr[:, :, c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((out_w, out_h), Image.BILINEAR)))
    return np.stack(chans, axis=-1)


def resize(im: np.ndarray, target_size: int, max_size: int, stride: int = 0):
    """Short-side resize with long-side cap; returns (image, im_scale)."""
    h, w = im.shape[:2]
    smin, smax = min(h, w), max(h, w)
    im_scale = float(target_size) / smin
    if round(im_scale * smax) > max_size:
        im_scale = float(max_size) / smax
    out_w, out_h = int(round(w * im_scale)), int(round(h * im_scale))
    out = _resize_np(im.astype(np.float32), out_w, out_h)
    if stride > 0:
        ph = int(np.ceil(out_h / stride) * stride)
        pw = int(np.ceil(out_w / stride) * stride)
        padded = np.zeros((ph, pw, out.shape[2]), np.float32)
        padded[:out_h, :out_w] = out
        out = padded
    return out, im_scale


def transform(im: np.ndarray, pixel_means, pixel_scale: float = 1.0):
    """BGR HxWx3 -> mean-subtracted RGB NHWC (1, H, W, 3)."""
    means = np.asarray(pixel_means, np.float32)  # [B, G, R]
    out = (im[:, :, ::-1].astype(np.float32)
           - means[::-1][None, None, :]) * pixel_scale
    return out[None]


def transform_mv_res(motion_vector: np.ndarray, res_diff: np.ndarray,
                     im_scale: float, pixel_means, pixel_scale: float = 1.0,
                     rcnn_stride: int = 16, legacy_swap: bool = False):
    """MV (H, W, 2) + residual (H, W, 3 BGR) -> feature-grid tensors
    (1, H', W', 2) and (1, H', W', 3 RGB), MV in feature-cell units.

    legacy_swap reproduces the reference's in-place channel-transform bug
    (lib/utils/image.py:217-218): output channel 2 reads the ALREADY-
    TRANSFORMED channel 0 instead of the raw blue residual. Weights trained
    by the reference expect that input; keep False for clean training."""
    h, w = res_diff.shape[:2]
    sw, sh = int(round(w * im_scale)), int(round(h * im_scale))
    mv = _resize_np(motion_vector.astype(np.float32), sw, sh)
    res = _resize_np(res_diff.astype(np.float32), sw, sh)

    ph = int(np.ceil(sh / rcnn_stride) * rcnn_stride)
    pw = int(np.ceil(sw / rcnn_stride) * rcnn_stride)
    mv_p = np.zeros((ph, pw, 2), np.float32)
    res_p = np.zeros((ph, pw, 3), np.float32)
    mv_p[:sh, :sw] = mv
    res_p[:sh, :sw] = res

    # residual channel transform: out_i = (in_{2-i} - mean_{2-i}) * scale
    means = np.asarray(pixel_means, np.float32)
    res_t = (res_p[:, :, ::-1] - means[::-1][None, None, :]) * pixel_scale
    if legacy_swap:
        # reference bug: ch2 reads the already-transformed ch0
        res_t = res_t.copy()
        res_t[:, :, 2] = (res_t[:, :, 0] - means[0]) * pixel_scale
    res_p = res_t

    fh, fw = ph // rcnn_stride, pw // rcnn_stride
    mv_f = _resize_np(mv_p, fw, fh)
    res_f = _resize_np(res_p, fw, fh)
    mv_f *= im_scale / rcnn_stride       # feature-cell units
    return mv_f[None], res_f[None]


def pad_to_bucket(tensor: np.ndarray, bucket_hw, axis_h: int = 1,
                  axis_w: int = 2) -> np.ndarray:
    """Zero-pad an NHWC tensor to a fixed (H, W) bucket (static shapes)."""
    bh, bw = bucket_hw
    h, w = tensor.shape[axis_h], tensor.shape[axis_w]
    assert h <= bh and w <= bw, (h, w, bucket_hw)
    pads = [(0, 0)] * tensor.ndim
    pads[axis_h] = (0, bh - h)
    pads[axis_w] = (0, bw - w)
    return np.pad(tensor, pads)


def check_reconstruction(key_im: np.ndarray, im: np.ndarray,
                         motion_vector: np.ndarray,
                         res_diff: np.ndarray) -> bool:
    """Pixel-exact compressed-stream invariant (lib/utils/image.py:79-89):
    key[p - mv(p)] + residual(p) == im(p) for every pixel. Raw (unnegated,
    unscaled) MV/residual as produced by the native loader."""
    h, w = im.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    sx = np.clip(xs - motion_vector[:, :, 0], 0, w - 1)
    sy = np.clip(ys - motion_vector[:, :, 1], 0, h - 1)
    recon = key_im[sy, sx].astype(np.int64) + res_diff
    return bool((recon == im.astype(np.int64)).all())


def load_frame_triplet(video_path: str, frame_id: int, gop_size: int = 12):
    """Decode (image, -MV, residual) for one frame via the native loader —
    the get_image contract (lib/utils/image.py:45-55) incl. the MV negation
    at :54."""
    from lsfa_tpu.data import coviar

    gop_id = frame_id // gop_size
    pos_id = frame_id % gop_size
    im = coviar.load(video_path, gop_id, pos_id, 0).astype(np.float32)
    mv = -coviar.load(video_path, gop_id, pos_id, 1).astype(np.float32)
    res = coviar.load(video_path, gop_id, pos_id, 2).astype(np.float32)
    return im, mv, res


def resized_dims(h: int, w: int, target_size: int, max_size: int):
    """Post-resize dims under the short-side/long-side rule."""
    smin, smax = min(h, w), max(h, w)
    im_scale = float(target_size) / smin
    if round(im_scale * smax) > max_size:
        im_scale = float(max_size) / smax
    return int(round(h * im_scale)), int(round(w * im_scale))


def pick_bucket(h: int, w: int, buckets, target_size: int, max_size: int):
    """Smallest configured (H, W) bucket that fits the resized image.
    Keeps portrait and landscape streams in separate compiled programs
    instead of one worst-case square bucket."""
    rh, rw = resized_dims(h, w, target_size, max_size)
    best = None
    for bh, bw in buckets:
        if rh <= bh and rw <= bw:
            if best is None or bh * bw < best[0] * best[1]:
                best = (bh, bw)
    if best is None:
        raise ValueError(
            f"no bucket in {list(buckets)} fits resized {rh}x{rw}; add one "
            f"to cfg.tpu.image_buckets")
    return best


def small_pool_factor(small_net_stride: int) -> int:
    """Host-side downscale factor feeding the small net: the model pools
    4x for stride 4 (backbone stage-1 adds /4) and 2x for stride 8
    (stage-2 adds /4) — reference fuse_small_net :215-224."""
    return 4 if small_net_stride == 4 else 2


def bgr_to_i420(frames: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 BGR -> (B, H*3/2, W, 1) planar I420 uint8.

    BT.601 limited range with 2x2 chroma mean — the inverse of the device
    converter (models/lsfa.py::_preprocess_i420) up to rounding, and the
    same packing the C data plane emits. Used for FORMAT-CONSISTENT
    fallbacks: when a loader serves i420 prepared payloads, frames that
    must go through the host BGR chain (stream shorter than the roidb's
    frame_seg_len — the reference hits this on every video's last frame,
    lib/utils/image.py:45-55) are packed so batch shapes stay uniform.
    BGR (0,0,0) padding maps to Y=16 U=V=128, which the device converts
    back to exact zeros. H and W must be multiples of 4 (bucket dims are
    multiples of 16; small buckets of 4)."""
    b, g, r = (frames[..., i].astype(np.float32) for i in range(3))
    y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    cb = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    cr = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    n, h, w = y.shape
    yp = np.clip(np.round(y), 0, 255).astype(np.uint8)

    def sub(c):
        c = c.reshape(n, h // 2, 2, w // 2, 2).mean((2, 4))
        return np.clip(np.round(c), 0, 255).astype(np.uint8)

    packed = np.concatenate([yp,
                             sub(cb).reshape(n, h // 4, w),
                             sub(cr).reshape(n, h // 4, w)], axis=1)
    return packed[..., None]
