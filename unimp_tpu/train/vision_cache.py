"""Precomputed frozen-vision feature cache for TRAINING.

The reference re-runs the frozen CLIP tower on the same item images
every epoch (the tower is frozen by the open_flamingo factory,
/root/reference/UniMP/mmrec.py:475-524, and the train-time transform is
deterministic — resize + normalize only, no augmentation,
/root/reference/UniMP/pipeline/mm_utils/rec_dataset.py:90-107). The
tower's output per item image is therefore a CONSTANT of training: this
module encodes every item once through ``UniMPModel.encode_vision_tower``
(the frozen half — the trainable perceiver stays in-step) and keeps the
features device-resident. Train batches then carry ``image_ids``
(TaskDataset(load_images=False)) and the step gathers rows instead of
running the ViT — removing both the tower's forward FLOPs (~20% of the
reference-shape step, utils/flops.py) and the per-batch host decode +
image upload.

Memory: n_items x (patches+1) x vision_width at the compute dtype.
CLIP-L/14 @224 is 257 x 1024 x 2B ~= 526 KB/item — Amazon beauty
(4,167 items) is 2.2 GB; the full 22,738-item catalog would be 11.6 GB
and does NOT fit next to a 3B model, so construction refuses beyond
``max_bytes`` and callers fall back to in-step encoding (the eval-side
post-resampler cache, evals/latent_cache.py, stays 8x smaller because
it caches AFTER the 64-latent bottleneck — an option training does not
have while the perceiver is trainable).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from unimp_tpu.data.transforms import normalize_on_device


def tower_cache_bytes(n_items: int, cfg) -> int:
    """HBM bytes for a tower cache of n_items at cfg's compute dtype."""
    p = cfg.vision.num_patches + 1
    itemsize = 2 if cfg.compute_dtype == jnp.bfloat16 else 4
    return n_items * p * cfg.vision.hidden_size * itemsize


def build_tower_cache(
    model,
    params,
    get_image: Callable[[int], np.ndarray],
    n_items: int,
    *,
    chunk: int = 64,
    max_bytes: int = 6 << 30,
    progress: Callable[[str], None] = lambda s: None,
) -> jax.Array:
    """Encode all item images through the frozen tower once.

    get_image(i) -> uint8 [H, W, 3] (TaskDataset._load_image). Returns
    a device array [n_items, P, Dv] in the model's compute dtype.
    """
    need = tower_cache_bytes(n_items, model.cfg)
    if need > max_bytes:
        raise ValueError(
            f"tower cache for {n_items} items needs {need / 2**30:.1f} GiB "
            f"(> max_bytes {max_bytes / 2**30:.1f} GiB); train without "
            "--cache_vision_latents for this catalog size"
        )

    @jax.jit
    def encode(p, imgs):
        # [chunk, H, W, 3] uint8 -> [chunk, P, Dv]
        feats = model.apply(
            {"params": p}, normalize_on_device(imgs[:, None]),
            method=type(model).encode_vision_tower,
        )
        return feats[:, 0]

    rows = []
    for start in range(0, n_items, chunk):
        idx = list(range(start, min(start + chunk, n_items)))
        imgs = np.stack([get_image(i) for i in idx])
        if len(idx) < chunk:  # pad the tail to the compiled shape
            pad = np.zeros((chunk - len(idx),) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        rows.append(encode(params, jnp.asarray(imgs))[: len(idx)])
        progress(f"vision cache {min(start + chunk, n_items)}/{n_items}")
    return jnp.concatenate(rows, axis=0)
