"""Feature extraction, retrieval neighbors, and semantic IDs.

Capability parity with /root/reference/UniMP/pipeline/utils/
(featextrater_clip.py, featextrater_llm.py, calculate_similarity.py,
cat_rank_feature.py): per-item image/text embeddings, cosine-similarity
retrieval neighbors (consumed via meta_data[item]["retrieval"] at
rec_dataset.py:743), and the semantic-ID mapping for --use_semantic
(512/512/512 + 32-way residual codes matching the token budget added at
mmrec.py:563-571).

The extractors run the framework's own vision tower / LM embeddings
under jit (no external CLIP checkpoint needed); with converted CLIP
weights loaded, the features become CLIP features.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def extract_image_features(model, params, data_dir, subset, item_ids,
                           image_size=224, batch_size=64):
    """Mean-pooled vision-tower features per item image -> [N, D]."""
    import jax
    import jax.numpy as jnp

    from unimp_tpu.data.transforms import load_image_rgb, preprocess_image

    @jax.jit
    def encode(p, pix):
        feats = model.apply(
            {"params": p}, pix,
            method=lambda m, x: m.vision(x),
        )
        return jnp.mean(feats, axis=1)

    out = []
    for i in range(0, len(item_ids), batch_size):
        chunk = item_ids[i : i + batch_size]
        imgs = np.stack([
            preprocess_image(
                load_image_rgb(os.path.join(data_dir, subset, f"{it}.jpg")),
                image_size,
            )
            for it in chunk
        ])
        out.append(np.asarray(encode(params, jnp.asarray(imgs))))
    return np.concatenate(out, axis=0)


def extract_text_features(model, params, tokenizer, texts, batch_size=64):
    """Mean-pooled token-embedding features per meta text -> [N, D]."""
    import jax
    import jax.numpy as jnp

    max_len = max(len(tokenizer.encode(t)) for t in texts)

    @jax.jit
    def embed(p, ids, mask):
        e = model.apply(
            {"params": p}, ids, method=lambda m, i: m.embed(i)
        ).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        return jnp.sum(e * mask[:, :, None], axis=1) / denom

    out = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i : i + batch_size]
        ids = np.zeros((len(chunk), max_len), np.int32)
        mask = np.zeros((len(chunk), max_len), np.float32)
        for j, t in enumerate(chunk):
            row = tokenizer.encode(t)[:max_len]
            ids[j, : len(row)] = row
            mask[j, : len(row)] = 1.0
        out.append(np.asarray(embed(params, ids, mask)))
    return np.concatenate(out, axis=0)


def cosine_topk(features: np.ndarray, k: int = 10) -> np.ndarray:
    """[N, D] -> [N, k] nearest-neighbor indices (self excluded)."""
    f = features / np.maximum(
        np.linalg.norm(features, axis=1, keepdims=True), 1e-8
    )
    sims = f @ f.T
    np.fill_diagonal(sims, -np.inf)
    return np.argsort(-sims, axis=1)[:, :k]


def add_retrieval_neighbors(data_dir: str, subset: str, features: np.ndarray,
                            item_ids: List[int], k: int = 10):
    """Write top-k neighbors into meta_{subset}.json "retrieval" fields."""
    path = os.path.join(data_dir, f"meta_{subset}.json")
    with open(path) as f:
        meta = json.load(f)
    nbrs = cosine_topk(features, k)
    for row, item in zip(nbrs, item_ids):
        entry = meta[str(item)]
        if isinstance(entry, dict):
            entry["retrieval"] = [int(item_ids[j]) for j in row]
    with open(path, "w") as f:
        json.dump(meta, f)


def _kmeans(x: np.ndarray, k: int, iters: int = 25, seed: int = 0):
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    centers = x[rng.choice(len(x), k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            pts = x[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    return centers, d.argmin(1)


def build_semantic_ids(
    features: np.ndarray,
    item_ids: List[int],
    out_path: str,
    levels: int = 3,
    codes_per_level: int = 512,
    last_codes: int = 32,
    seed: int = 0,
) -> Dict[str, str]:
    """Residual-quantization semantic IDs: `levels` stages of
    codes_per_level codes plus a `last_codes` disambiguation stage —
    matching the --use_semantic token budget (512 item_{i} + 32
    item_last_{i}, mmrec.py:563-571). Writes id2semantic.json."""
    x = features.astype(np.float64).copy()
    codes = []
    for lvl in range(levels):
        centers, assign = _kmeans(x, codes_per_level, seed=seed + lvl)
        codes.append(assign)
        x = x - centers[assign]
    # final stage: disambiguate collisions within identical prefixes
    prefix = {}
    last = np.zeros(len(features), np.int64)
    for i in range(len(features)):
        key = tuple(c[i] for c in codes)
        last[i] = prefix.get(key, -1) + 1
        prefix[key] = last[i]
    last = last % last_codes
    mapping = {
        str(item): ",".join(str(int(c[i])) for c in codes) + f",{int(last[i])}"
        for i, item in enumerate(item_ids)
    }
    with open(out_path, "w") as f:
        json.dump(mapping, f)
    return mapping
