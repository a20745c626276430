"""Image preprocessing: decode, resize, CLIP-normalize.

Parity with the reference's torchvision pipeline RandomResize(single
scale) -> ToTensor -> Normalize(FLAMINGO mean/std)
(/root/reference/UniMP/pipeline/mm_utils/rec_dataset.py:90-107,30-31),
re-expressed in numpy/PIL with NHWC output — the TPU-natural layout
(the whole normalize step can also fuse on-device; see
``normalize_on_device``).
"""

from __future__ import annotations

import numpy as np

FLAMINGO_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
FLAMINGO_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_image_rgb(path: str) -> np.ndarray:
    """Decode to uint8 RGB [H, W, 3] (truncated files tolerated)."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(img).resize((size, size), Image.BILINEAR)
    return np.asarray(im)


def preprocess_image(img: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [H, W, 3] -> float32 CLIP-normalized [size, size, 3]."""
    if img.shape[0] != size or img.shape[1] != size:
        img = resize_bilinear(img, size)
    x = img.astype(np.float32) / 255.0
    return (x - FLAMINGO_MEAN) / FLAMINGO_STD


def load_resized_uint8(path: str, size: int) -> np.ndarray:
    """Decode + resize to uint8 [size, size, 3]: native C++ pipeline when
    built (unimp_tpu/native/imagepipe.cc), PIL otherwise."""
    from unimp_tpu.data import native

    if native.available():
        with open(path, "rb") as f:
            data = f.read()
        out = native.decode_resize(data, size)
        if out is not None:
            return out
    return preprocess_uint8(load_image_rgb(path), size)


def preprocess_uint8(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Resize only; keep uint8 for cheap host->device transfer."""
    if img.shape[0] != size or img.shape[1] != size:
        img = resize_bilinear(img, size)
    return img


def normalize_on_device(x):
    """uint8 [..., H, W, 3] on device -> normalized float; fuses into the
    vision tower's first matmul under jit (keeps host->device traffic at
    1 byte/px instead of 4)."""
    import jax.numpy as jnp

    mean = jnp.asarray(FLAMINGO_MEAN)
    std = jnp.asarray(FLAMINGO_STD)
    return (x.astype(jnp.float32) / 255.0 - mean) / std
