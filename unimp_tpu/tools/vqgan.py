"""Hermetic VQ image tokenizer for the img_gen task.

The reference generates VQGAN codebook-token strings and decodes them
offline with an externally downloaded taming-transformers VQGAN
(/root/reference/README.md:48, eval_img_gen.py:102-144). This module
provides a self-contained equivalent so the img_gen task runs end to
end without downloads:

  * a 1024-entry patch codebook (matching the img_{0..1023} token budget,
    mmrec.py:578-581) learned by k-means over PCA-projected image patches
  * encode(): image -> grid of codebook tokens
  * decode(): tokens -> image (codebook patch reconstruction)
  * writes img_id2semantic.json (item -> token list) consumed by the
    img_gen prompt builders (rec_dataset.py:613-720)

A converter hook (`from_torch_vqgan`) is the extension point for real
VQGAN weights when available.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

CODEBOOK_SIZE = 1024  # mmrec.py:578-581


class PatchVQTokenizer:
    def __init__(self, patch: int = 16, pca_dim: int = 64,
                 codebook_size: int = CODEBOOK_SIZE):
        self.patch = patch
        self.pca_dim = pca_dim
        self.codebook_size = codebook_size
        self.mean: Optional[np.ndarray] = None
        self.basis: Optional[np.ndarray] = None  # [P*P*3, pca_dim]
        self.codebook: Optional[np.ndarray] = None  # [K, pca_dim]

    # ---------------- training ----------------

    def _patches(self, images: np.ndarray) -> np.ndarray:
        n, h, w, c = images.shape
        p = self.patch
        gh, gw = h // p, w // p
        x = images[:, : gh * p, : gw * p].reshape(n, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n * gh * gw, p * p * c)
        return x.astype(np.float32) / 255.0

    def fit(self, images: np.ndarray, seed: int = 0, kmeans_iters: int = 20):
        """images: uint8 [N, H, W, 3] (all the item images)."""
        x = self._patches(images)
        self.mean = x.mean(0)
        xc = x - self.mean
        # PCA via SVD on a subsample
        rng = np.random.default_rng(seed)
        sub = xc[rng.choice(len(xc), min(len(xc), 20_000), replace=False)]
        _, _, vt = np.linalg.svd(sub, full_matrices=False)
        self.basis = vt[: self.pca_dim].T  # [D, pca]
        z = xc @ self.basis
        k = min(self.codebook_size, len(z))
        centers = z[rng.choice(len(z), k, replace=False)].copy()
        for _ in range(kmeans_iters):
            # chunked distance computation
            assign = self._assign(z, centers)
            for j in range(k):
                pts = z[assign == j]
                if len(pts):
                    centers[j] = pts.mean(0)
        if k < self.codebook_size:
            centers = np.concatenate(
                [centers, np.zeros((self.codebook_size - k, self.pca_dim),
                                   centers.dtype)]
            )
        self.codebook = centers
        return self

    @staticmethod
    def _assign(z: np.ndarray, centers: np.ndarray) -> np.ndarray:
        out = np.empty(len(z), np.int64)
        step = 8192
        c2 = (centers**2).sum(1)
        for i in range(0, len(z), step):
            chunk = z[i : i + step]
            d = c2[None, :] - 2 * chunk @ centers.T
            out[i : i + step] = d.argmin(1)
        return out

    # ---------------- encode / decode ----------------

    def encode(self, images: np.ndarray) -> np.ndarray:
        """uint8 [N, H, W, 3] -> int tokens [N, gh*gw]."""
        n, h, w, _ = images.shape
        gh, gw = h // self.patch, w // self.patch
        z = (self._patches(images) - self.mean) @ self.basis
        return self._assign(z, self.codebook).reshape(n, gh * gw)

    def decode(self, tokens: np.ndarray, grid: Optional[int] = None) -> np.ndarray:
        """int tokens [N, G] -> uint8 images [N, g*p, g*p, 3]."""
        n, g = tokens.shape
        gh = grid or int(round(g**0.5))
        gw = g // gh
        p = self.patch
        patches = self.codebook[tokens.reshape(-1)] @ self.basis.T + self.mean
        x = patches.reshape(n, gh, gw, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(n, gh * p, gw * p, 3)
        return np.clip(x * 255.0, 0, 255).astype(np.uint8)

    # ---------------- persistence ----------------

    def save(self, path: str):
        np.savez(path, patch=self.patch, pca_dim=self.pca_dim,
                 codebook_size=self.codebook_size, mean=self.mean,
                 basis=self.basis, codebook=self.codebook)

    @classmethod
    def load(cls, path: str) -> "PatchVQTokenizer":
        z = np.load(path)
        obj = cls(int(z["patch"]), int(z["pca_dim"]), int(z["codebook_size"]))
        obj.mean, obj.basis, obj.codebook = z["mean"], z["basis"], z["codebook"]
        return obj

    @classmethod
    def from_torch_vqgan(cls, checkpoint_path: str):
        """Load a real taming-transformers VQGAN checkpoint.

        Returns a VQGANDecoder (decode()-compatible with this class) —
        the offline img_gen decode step of the reference flow
        (README.md:48) with real weights instead of the hermetic
        patch codebook."""
        from unimp_tpu.tools.vqgan_decoder import VQGANDecoder

        return VQGANDecoder.from_torch_checkpoint(checkpoint_path)


def tokenize_item_images(
    data_dir: str, subset: str, item_ids: List[int], *,
    image_size: int = 224, n_tokens: int = 4, seed: int = 0,
) -> dict:
    """Fit a codebook on the item images and write img_id2semantic.json
    (item -> leading n_tokens codebook tokens, the compact per-item image
    id used in prompts; the full grids are written alongside)."""
    from unimp_tpu.data.transforms import load_image_rgb, preprocess_uint8

    imgs = np.stack([
        preprocess_uint8(
            load_image_rgb(os.path.join(data_dir, subset, f"{i}.jpg")),
            image_size,
        )
        for i in item_ids
    ])
    vq = PatchVQTokenizer().fit(imgs, seed=seed)
    tokens = vq.encode(imgs)
    mapping = {str(i): [int(t) for t in row[:n_tokens]]
               for i, row in zip(item_ids, tokens)}
    with open(os.path.join(data_dir, "img_id2semantic.json"), "w") as f:
        json.dump(mapping, f)
    with open(os.path.join(data_dir, "img_tokens_full.json"), "w") as f:
        json.dump({str(i): [int(t) for t in row]
                   for i, row in zip(item_ids, tokens)}, f)
    vq.save(os.path.join(data_dir, "vq_codebook.npz"))
    return mapping


def parse_img_tokens(text: str) -> List[int]:
    """'img_789,img_591, ...' (or space-separated 'img_789 img_591')
    -> [789, 591, ...]; malformed pieces skipped."""
    out = []
    for piece in text.replace(",", " ").split():
        if piece.startswith("img_"):
            tail = piece[4:]
            if tail.isdigit():
                tok = int(tail)
                if 0 <= tok < CODEBOOK_SIZE:
                    out.append(tok)
    return out


def decode_generation_dump(dump_path: str, codebook_path: str, out_dir: str,
                           grid: int = 14) -> List[str]:
    """Decode an eval_img_gen dump (generated token strings) to PNGs —
    the offline VQGAN decode step of the reference (README.md:48),
    hermetic here. Sequences are padded/truncated to grid*grid tokens."""
    import json as _json

    from PIL import Image

    vq = PatchVQTokenizer.load(codebook_path)
    with open(dump_path) as f:
        records = _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, rec in enumerate(records):
        toks = parse_img_tokens(rec["generated"])
        need = grid * grid
        toks = (toks + [0] * need)[:need]
        img = vq.decode(np.asarray([toks]), grid=grid)[0]
        p = os.path.join(out_dir, f"gen_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths
