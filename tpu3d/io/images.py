"""Host-side image loading (the one part that stays CPU: JPEG decode).

Replaces cv2.imread usage (ref feature_extraction.py:25). Decode via PIL,
optional downscale, grayscale conversion for the detector, uint8 RGB kept
for color sampling. Decoding is wall-clock trivial next to matching/BA and
overlaps with device compute when batched.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".tif", ".tiff", ".raw"}


def list_images(img_dir: str) -> List[str]:
    """Sorted image filenames in a directory (ref feature_extraction.py:13)."""
    out = []
    for f in sorted(os.listdir(img_dir)):
        p = os.path.join(img_dir, f)
        if os.path.isfile(p) and os.path.splitext(f)[1].lower() in IMAGE_EXTS:
            out.append(f)
    return out


def load_images(
    img_dir: str,
    names: Sequence[str],
    downscale: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load images as (N, H, W) float32 gray in [0,1] and (N, H, W, 3) uint8
    RGB. All images must share one size (true for ystad_kloster)."""
    def _load_one(name):
        img = Image.open(os.path.join(img_dir, name))
        target = (img.width // downscale, img.height // downscale)
        if downscale > 1:
            # JPEG draft mode decodes at the nearest DCT scale (1/2, 1/4,
            # 1/8) directly in the decoder — ~4x cheaper at downscale 2
            # than decode-then-resize. No-op for non-JPEG formats.
            img.draft("RGB", target)
        img = img.convert("RGB")
        if img.size != target:
            img = img.resize(target, Image.BILINEAR)
        rgb = np.asarray(img, np.uint8)
        gray = np.asarray(img.convert("L"), np.float32) / 255.0
        return gray, rgb

    from concurrent.futures import ThreadPoolExecutor

    if len(names) > 1:
        with ThreadPoolExecutor(max_workers=min(4, (os.cpu_count() or 2) * 2)) as ex:
            results = list(ex.map(_load_one, names))
    else:
        results = [_load_one(n) for n in names]
    grays = [g for g, _ in results]
    rgbs = [c for _, c in results]
    return np.stack(grays), np.stack(rgbs)


def load_image_batch(img_dir: str, names: Sequence[str], start: int, batch: int, downscale: int = 1):
    """One batch worth of images (for streaming extraction)."""
    chunk = list(names[start : start + batch])
    if not chunk:
        return None, None, []
    g, c = load_images(img_dir, chunk, downscale)
    return g, c, chunk
