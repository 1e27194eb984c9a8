"""Image / flow / depth IO and color-space utilities.

Reference equivalent: the IO half of src/Datasets/utils.py (load_images
:134-149, save_image :207-225, Middlebury .flo IO :82-99,228-278, sRGB
conversions :38-47, flow visualization :281-297). PIL replaces torchvision;
parallel decoding uses a thread pool (PIL releases the GIL during decode),
replacing the reference's multiprocessing pools — cheaper on TPU hosts and
no process-spawn requirements.
"""

from __future__ import annotations

import struct
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Iterable, Sequence

import numpy as np
from PIL import Image

__all__ = [
    'load_image', 'save_image', 'resize_image', 'load_images_parallel',
    'read_flow', 'write_flow', 'flow_to_color',
    'srgb_to_linear', 'linear_to_srgb',
]

_FLO_MAGIC = 202021.25


def load_image(path: str | Path, scale_factor: float | None = None) -> np.ndarray:
    """Decode an image file -> float32 HWC array in [0, 1].

    Preserves an alpha channel if present (reference: Datasets/utils.py:134-160).
    16-bit PNGs are scaled by 65535, 8-bit by 255.

    png/jpeg decode goes through the native C++ library when available
    (nerficg_tpu/native, libpng/libjpeg outside the GIL); anything else —
    or a failed native decode — falls back to PIL.
    """
    suffix = str(path).lower().rsplit('.', 1)[-1]
    if suffix in ('png', 'jpg', 'jpeg'):
        from nerficg_tpu.native import decode_image as _native_decode
        arr = _native_decode(path)
        if arr is not None:
            if scale_factor is not None and scale_factor != 1.0:
                arr = resize_image(arr, scale_factor)
            return arr
    with Image.open(path) as img:
        if scale_factor is not None and scale_factor != 1.0:
            new_size = (max(int(round(img.width * scale_factor)), 1),
                        max(int(round(img.height * scale_factor)), 1))
            img = img.resize(new_size, Image.LANCZOS)
        arr = np.asarray(img)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    elif arr.dtype in (np.int32, np.uint32):
        arr = arr.astype(np.float32) / 65535.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def resize_image(image: np.ndarray, scale_factor: float) -> np.ndarray:
    """Resize a float32 HWC image with Lanczos filtering."""
    if scale_factor == 1.0:
        return image
    h, w = image.shape[:2]
    new_size = (max(int(round(w * scale_factor)), 1),
                max(int(round(h * scale_factor)), 1))
    channels = image.shape[2]
    if channels in (1, 3, 4):
        mode_img = Image.fromarray(
            (np.clip(image.squeeze(-1) if channels == 1 else image, 0, 1)
             * 255).astype(np.uint8))
        resized = np.asarray(mode_img.resize(new_size, Image.LANCZOS),
                             dtype=np.float32) / 255.0
        if resized.ndim == 2:
            resized = resized[..., None]
        return resized
    # Fallback per-channel for unusual channel counts (e.g., flow).
    out = [np.asarray(Image.fromarray(image[..., c]).resize(new_size, Image.BILINEAR))
           for c in range(channels)]
    return np.stack(out, axis=-1).astype(np.float32)


def save_image(image: np.ndarray, path: str | Path) -> None:
    """Save a float32 HWC image in [0, 1] as 8-bit png/jpg
    (reference: Datasets/utils.py:207-225)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_images_parallel(paths: Sequence[str | Path],
                         scale_factor: float | None = None,
                         load_fn: Callable | None = None,
                         max_workers: int = 8) -> list[np.ndarray]:
    """Threaded parallel decode (reference: load_images, Datasets/utils.py:134-149)."""
    fn = load_fn if load_fn is not None else load_image
    if load_fn is None and (scale_factor is None or scale_factor == 1.0):
        # Fast path: the native C++ thread-pool batch decoder.
        suffixes = {str(p).lower().rsplit('.', 1)[-1] for p in paths}
        if suffixes <= {'png', 'jpg', 'jpeg'}:
            from nerficg_tpu.native import decode_batch
            out = decode_batch(list(paths), n_threads=max_workers)
            if out is not None:
                return out
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(lambda p: fn(p, scale_factor), paths))


# -- Middlebury .flo optical-flow format -------------------------------------

def read_flow(path: str | Path) -> np.ndarray:
    """Read Middlebury .flo -> (H, W, 2) float32 (reference: utils.py:228-252)."""
    with open(path, 'rb') as f:
        magic = struct.unpack('f', f.read(4))[0]
        if abs(magic - _FLO_MAGIC) > 1e-3:
            raise ValueError(f'{path}: bad .flo magic {magic}')
        width = struct.unpack('i', f.read(4))[0]
        height = struct.unpack('i', f.read(4))[0]
        data = np.frombuffer(f.read(width * height * 2 * 4), dtype=np.float32)
    return data.reshape(height, width, 2).copy()


def write_flow(flow: np.ndarray, path: str | Path) -> None:
    """Write (H, W, 2) float32 -> Middlebury .flo (reference: utils.py:254-278)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    h, w = flow.shape[:2]
    with open(path, 'wb') as f:
        f.write(struct.pack('f', _FLO_MAGIC))
        f.write(struct.pack('i', w))
        f.write(struct.pack('i', h))
        f.write(flow.astype(np.float32).tobytes())


def flow_to_color(flow: np.ndarray, max_radius: float | None = None) -> np.ndarray:
    """Optical flow -> HSV-style color wheel image (reference: utils.py:281-297)."""
    u, v = flow[..., 0], flow[..., 1]
    radius = np.sqrt(u * u + v * v)
    if max_radius is None:
        max_radius = max(radius.max(), 1e-6)
    radius = np.clip(radius / max_radius, 0.0, 1.0)
    angle = (np.arctan2(-v, -u) / np.pi + 1.0) / 2.0  # [0, 1]
    hsv = np.stack([angle, radius, np.ones_like(radius)], axis=-1)
    # Vectorized HSV->RGB.
    h6 = hsv[..., 0] * 6.0
    i = np.floor(h6).astype(np.int32) % 6
    f = h6 - np.floor(h6)
    s, vv = hsv[..., 1], hsv[..., 2]
    p, q, t = vv * (1 - s), vv * (1 - f * s), vv * (1 - (1 - f) * s)
    i = i[..., None]
    rgb = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [np.stack([vv, t, p], -1), np.stack([q, vv, p], -1),
         np.stack([p, vv, t], -1), np.stack([p, q, vv], -1),
         np.stack([t, p, vv], -1), np.stack([vv, p, q], -1)])
    return rgb.astype(np.float32)


# -- color spaces --------------------------------------------------------------

def srgb_to_linear(srgb: np.ndarray) -> np.ndarray:
    """(reference: Datasets/utils.py:38-42)"""
    return np.where(srgb <= 0.04045, srgb / 12.92,
                    ((srgb + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(linear: np.ndarray) -> np.ndarray:
    """(reference: Datasets/utils.py:44-47)"""
    return np.where(linear <= 0.0031308, linear * 12.92,
                    1.055 * np.clip(linear, 1e-12, None) ** (1.0 / 2.4) - 0.055)
