"""Host-side data augmentation pipeline.

Deterministic numpy/cv2 transforms over sample dicts, each taking an explicit
``np.random.Generator`` — no global RNG state, so any sample is exactly
reproducible from (epoch, index) seeds and multi-host pipelines stay in sync.

Sample dict contract (5-channel PE layout, reference loading.py:488-527):
  img        (H, W, 5) float32 — RGB in 0..255, PE clipped prior, raw PE
  depth_gt   (H, W)    float32 — metric depth, 0 = invalid
  pe_k_gt    (H, W)    float32 — slope class ids 0..10, 255 = ignore
  pe_ori_point  float           — raw PE at the bottom-right corner
  cam_height    float           — ground height for adaptive PE (DDAD varies)
  valid_mask (H, W)    float32 — optional; tracks real pixels through padding

Without PE the img is (H, W, 3). ``depth_fields`` semantics from the
reference (nearest interpolation, pe fields pad with 255) are baked in.

Behavior parity notes per transform are in each docstring, citing
/root/reference/depth/datasets/pipelines/transforms.py (line numbers in
SURVEY.md §2.4).
"""
from __future__ import annotations

import numpy as np
import cv2

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)

_DEPTH_FIELDS = ("depth_gt", "pe_k_gt")


def _img_channels(sample):
    return sample["img"].shape[-1]


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample, rng):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class KBCrop:
    """Bottom-centered KITTI crop to (height, width) = (352, 1216).

    Applies to img always; to depth/slope GT when crop_gt (train).
    Reference transforms.py:149-205.
    """

    def __init__(self, height=352, width=1216, crop_gt=True):
        self.height = height
        self.width = width
        self.crop_gt = crop_gt

    def __call__(self, sample, rng):
        h, w = sample["img"].shape[:2]
        top = int(h - self.height)
        left = int((w - self.width) / 2)
        sample["img"] = sample["img"][top:top + self.height,
                                      left:left + self.width]
        if self.crop_gt:
            for key in _DEPTH_FIELDS:
                if key in sample:
                    sample[key] = sample[key][top:top + self.height,
                                              left:left + self.width]
        return sample


def _resize_multichannel(img, size_wh, interpolation):
    """cv2.resize that tolerates >4 channels by slicing."""
    if img.ndim == 2 or img.shape[2] <= 4:
        return cv2.resize(img, size_wh, interpolation=interpolation)
    chunks = [cv2.resize(img[..., i:i + 4], size_wh, interpolation=interpolation)
              for i in range(0, img.shape[2], 4)]
    chunks = [c[..., None] if c.ndim == 2 else c for c in chunks]
    return np.concatenate(chunks, axis=-1)


class NYUCrop:
    """NYU standard crop [45:472, 43:608] on img and depth GT
    (reference transforms.py:114-142)."""

    def __call__(self, sample, rng):
        sample["img"] = sample["img"][45:472, 43:608]
        for key in _DEPTH_FIELDS:
            if key in sample:
                sample[key] = sample[key][45:472, 43:608]
        return sample

    def __repr__(self):
        return "NYUCrop()"


class RandomRatioResize:
    """Uniform random scale in ratio_range: bilinear on the full 5-channel
    img, nearest on GT fields. Mirrors Resize(ratio_range=(0.5, 2.0)) with
    img_scale=None (reference transforms.py:484-732, mode 1): the new size is
    (int(W*r), int(H*r)) of the *current* image.
    """

    def __init__(self, ratio_range=(0.5, 2.0)):
        self.ratio_range = ratio_range

    def __call__(self, sample, rng):
        lo, hi = self.ratio_range
        ratio = rng.random() * (hi - lo) + lo
        h, w = sample["img"].shape[:2]
        new_w, new_h = int(w * ratio), int(h * ratio)
        sample["img"] = _resize_multichannel(
            sample["img"], (new_w, new_h), cv2.INTER_LINEAR)
        for key in _DEPTH_FIELDS:
            if key in sample:
                sample[key] = cv2.resize(
                    sample[key], (new_w, new_h),
                    interpolation=cv2.INTER_NEAREST)
        return sample


class PadToSize:
    """If smaller than (H, W), paste at a random offset into a zero canvas;
    slope GT pads with 255 (ignore). Reference transforms.py:64-109.

    Also maintains a ``valid_mask`` so downstream consumers (loss) can ignore
    padded pixels the same way the reference does implicitly via depth 0.
    """

    def __init__(self, height=352, width=1216):
        self.height = height
        self.width = width

    def __call__(self, sample, rng):
        img = sample["img"]
        h, w = img.shape[:2]
        if h >= self.height and w >= self.width:
            return sample
        th, tw = max(h, self.height), max(w, self.width)
        h_off = int(rng.integers(0, th - h + 1))
        w_off = int(rng.integers(0, tw - w + 1))

        new_img = np.zeros((th, tw, img.shape[2]), dtype=img.dtype)
        new_img[h_off:h_off + h, w_off:w_off + w] = img
        sample["img"] = new_img
        for key in _DEPTH_FIELDS:
            if key not in sample:
                continue
            fill = 255.0 if "pe" in key else 0.0
            canvas = np.full((th, tw), fill, dtype=sample[key].dtype)
            canvas[h_off:h_off + h, w_off:w_off + w] = sample[key]
            sample[key] = canvas
        mask = np.zeros((th, tw), dtype=np.float32)
        mask[h_off:h_off + h, w_off:w_off + w] = 1.0
        sample["valid_mask"] = mask
        return sample


class RandomRotate:
    """Random in-plane rotation: bilinear border-0 for img, nearest for GT
    fields with border 255 for pe fields / 0 for depth.
    Reference transforms.py:208-296.
    """

    def __init__(self, prob=0.5, degree=2.5):
        self.prob = prob
        self.degree = (-degree, degree) if np.isscalar(degree) else degree

    @staticmethod
    def _rotate(img, angle, border_value, interpolation):
        h, w = img.shape[:2]
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
        matrix = cv2.getRotationMatrix2D(center, -angle, 1.0)
        if img.ndim == 3 and img.shape[2] > 4:
            chunks = [cv2.warpAffine(img[..., i:i + 4], matrix, (w, h),
                                     flags=interpolation,
                                     borderValue=border_value)
                      for i in range(0, img.shape[2], 4)]
            chunks = [c[..., None] if c.ndim == 2 else c for c in chunks]
            return np.concatenate(chunks, axis=-1)
        return cv2.warpAffine(img, matrix, (w, h), flags=interpolation,
                              borderValue=border_value)

    def __call__(self, sample, rng):
        rotate = rng.random() < self.prob
        degree = rng.uniform(min(*self.degree), max(*self.degree))
        if not rotate:
            return sample
        sample["img"] = self._rotate(sample["img"], degree, 0,
                                     cv2.INTER_LINEAR)
        for key in _DEPTH_FIELDS:
            if key in sample:
                border = 255.0 if "pe" in key else 0.0
                sample[key] = self._rotate(sample[key], degree, border,
                                           cv2.INTER_NEAREST)
        if "valid_mask" in sample:
            sample["valid_mask"] = self._rotate(
                sample["valid_mask"], degree, 0, cv2.INTER_NEAREST)
        return sample


class RandomFlip:
    """Horizontal flip of img + GT fields. Reference transforms.py:299-353."""

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            sample["img"] = np.ascontiguousarray(sample["img"][:, ::-1])
            for key in _DEPTH_FIELDS + ("valid_mask",):
                if key in sample:
                    sample[key] = np.ascontiguousarray(sample[key][:, ::-1])
            sample["flipped"] = True
        return sample


class RandomCrop:
    """Random (352, 704) crop. Reference transforms.py:356-417."""

    def __init__(self, crop_size=(352, 704)):
        self.crop_size = crop_size

    def __call__(self, sample, rng):
        ch, cw = self.crop_size
        h, w = sample["img"].shape[:2]
        off_h = int(rng.integers(0, max(h - ch, 0) + 1))
        off_w = int(rng.integers(0, max(w - cw, 0) + 1))
        sl = np.s_[off_h:off_h + ch, off_w:off_w + cw]
        sample["img"] = sample["img"][sl]
        for key in _DEPTH_FIELDS + ("valid_mask",):
            if key in sample:
                sample[key] = sample[key][sl]
        return sample


class ColorAug:
    """Gamma/brightness/per-channel color jitter on the RGB channels only,
    in 0..255 space, clipped. Reference transforms.py:420-481."""

    def __init__(self, prob=0.5, gamma_range=(0.9, 1.1),
                 brightness_range=(0.9, 1.1), color_range=(0.9, 1.1)):
        self.prob = prob
        self.gamma_range = gamma_range
        self.brightness_range = brightness_range
        self.color_range = color_range

    def __call__(self, sample, rng):
        if rng.random() >= self.prob:
            return sample
        rgb = sample["img"][..., :3]
        gamma = rng.uniform(*self.gamma_range)
        brightness = rng.uniform(*self.brightness_range)
        colors = rng.uniform(*self.color_range, size=3).astype(np.float32)
        out = (rgb ** gamma) * brightness * colors[None, None, :]
        sample["img"][..., :3] = np.clip(out, 0, 255)
        return sample


class Normalize:
    """ImageNet-normalize RGB; divide the clipped-PE channel (positive values
    only) by depth_scale; pass the raw-PE channel through.
    Reference transforms.py:12-62. Input RGB is expected in RGB order already
    (we load with PIL/cv2-converted), matching the reference's to_rgb=True.
    """

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD, depth_scale=200.0):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)
        self.depth_scale = float(depth_scale)

    def __call__(self, sample, rng=None):
        img = sample["img"]
        rgb = (img[..., :3] - self.mean) / self.std
        if img.shape[-1] == 5:
            pe = img[..., 3].copy()
            pe[pe > 0] = pe[pe > 0] / self.depth_scale
            sample["img"] = np.concatenate(
                [rgb, pe[..., None], img[..., 4:5]], axis=-1)
        else:
            sample["img"] = rgb
        return sample


class DDADResize:
    """DDAD resize to (384, 640): INTER_AREA RGB, nearest PE channels, and
    sparse re-scatter of valid depth/slope points into the new grid.
    Reference transforms.py:735-783.
    """

    def __init__(self, shape=(384, 640), resize_gt=True):
        self.shape = tuple(shape)
        self.resize_gt = resize_gt

    def _scatter_resize(self, x):
        h, w = x.shape
        th, tw = self.shape
        ys, xs = np.nonzero(x > 0)
        vals = x[ys, xs]
        ys = (ys * (th / h)).astype(np.int32)
        xs = (xs * (tw / w)).astype(np.int32)
        keep = (ys < th) & (xs < tw)
        out = np.zeros(self.shape, dtype=x.dtype)
        out[ys[keep], xs[keep]] = vals[keep]
        return out

    def __call__(self, sample, rng=None):
        img = sample["img"]
        size_wh = self.shape[::-1]
        if img.shape[-1] == 5:
            rgb = cv2.resize(img[..., :3].astype(np.uint8), size_wh,
                             interpolation=cv2.INTER_AREA).astype(np.float32)
            pe = cv2.resize(img[..., 3].astype(np.float32), size_wh,
                            interpolation=cv2.INTER_NEAREST)
            pe_raw = cv2.resize(img[..., 4].astype(np.float32), size_wh,
                                interpolation=cv2.INTER_NEAREST)
            sample["img"] = np.concatenate(
                [rgb, pe[..., None], pe_raw[..., None]], axis=-1)
        else:
            sample["img"] = cv2.resize(img, size_wh,
                                       interpolation=cv2.INTER_AREA)
        if self.resize_gt and "depth_gt" in sample:
            sample["depth_gt"] = self._scatter_resize(sample["depth_gt"])
            if "pe_k_gt" in sample:
                sample["pe_k_gt"] = self._scatter_resize(sample["pe_k_gt"])
        return sample
