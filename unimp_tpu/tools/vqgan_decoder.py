"""Real VQGAN decoder (taming-transformers layout) in JAX.

The reference's img_gen flow generates ``img_{i}`` codebook-token
strings and decodes them OFFLINE with an externally downloaded
taming-transformers VQGAN (/root/reference/README.md:48,
pipeline/eval/eval_img_gen.py:102-144; the VQGAN itself is not
in-tree). This module completes that flow TPU-natively: it loads a
taming VQGAN checkpoint (``state_dict`` with ``quantize.embedding`` /
``post_quant_conv`` / ``decoder.*`` keys), infers the decoder
architecture from the weight shapes (channel multipliers, blocks per
level, attention placement), and runs codes -> image as one jitted
NHWC program.

Covers the standard published configs (f16-1024 / f16-16384 /
f8-8192: ResnetBlocks with nin shortcuts, mid attention, nearest-2x
upsample convs, GroupNorm(32), swish) without hardcoding any of them.
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _group_norm(x, scale, bias, groups: int = 32, eps: float = 1e-6):
    """NHWC GroupNorm matching torch.nn.GroupNorm(32, C, eps=1e-6)."""
    n, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(n, h, w, g, c // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(n, h, w, c) * scale + bias


def _conv(x, p, stride: int = 1):
    """NHWC conv with 'same' padding for 3x3 / 'valid' for 1x1 kernels."""
    w, b = p["weight"], p["bias"]
    kh = w.shape[0]
    pad = [(kh // 2, kh // 2)] * 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _resnet_block(x, p):
    h = _conv(_swish(_group_norm(x, p["norm1.weight"], p["norm1.bias"])),
              {"weight": p["conv1.weight"], "bias": p["conv1.bias"]})
    h = _conv(_swish(_group_norm(h, p["norm2.weight"], p["norm2.bias"])),
              {"weight": p["conv2.weight"], "bias": p["conv2.bias"]})
    if "nin_shortcut.weight" in p:
        x = _conv(x, {"weight": p["nin_shortcut.weight"],
                      "bias": p["nin_shortcut.bias"]})
    elif "conv_shortcut.weight" in p:
        x = _conv(x, {"weight": p["conv_shortcut.weight"],
                      "bias": p["conv_shortcut.bias"]})
    return x + h


def _attn_block(x, p):
    n, hh, ww, c = x.shape
    h = _group_norm(x, p["norm.weight"], p["norm.bias"])
    q = _conv(h, {"weight": p["q.weight"], "bias": p["q.bias"]})
    k = _conv(h, {"weight": p["k.weight"], "bias": p["k.bias"]})
    v = _conv(h, {"weight": p["v.weight"], "bias": p["v.bias"]})
    q = q.reshape(n, hh * ww, c)
    k = k.reshape(n, hh * ww, c)
    v = v.reshape(n, hh * ww, c)
    att = jax.nn.softmax(
        jnp.einsum("nqc,nkc->nqk", q, k) * (c ** -0.5), axis=-1
    )
    h = jnp.einsum("nqk,nkc->nqc", att, v).reshape(n, hh, ww, c)
    h = _conv(h, {"weight": p["proj_out.weight"], "bias": p["proj_out.bias"]})
    return x + h


def _upsample(x, p):
    n, h, w, c = x.shape
    x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
    return _conv(x, p)


class VQGANDecoder:
    """codes [N, G] -> uint8 images [N, H, W, 3]."""

    def __init__(self, params: Dict[str, np.ndarray]):
        self.p = params
        self.n_embed, self.embed_dim = params["quantize.embedding.weight"].shape
        # architecture inferred from key structure
        lvl, blk = {}, {}
        self.attn_levels = set()
        for key in params:
            m = re.match(r"decoder\.up\.(\d+)\.block\.(\d+)\.", key)
            if m:
                i, j = int(m.group(1)), int(m.group(2))
                lvl[i] = True
                blk[i] = max(blk.get(i, 0), j + 1)
            if re.match(r"decoder\.up\.(\d+)\.attn\.", key):
                self.attn_levels.add(int(key.split(".")[2]))
        self.num_levels = max(lvl) + 1 if lvl else 0
        self.blocks_per_level = blk
        self._decode = jax.jit(self._forward)

    # ---------------- weight loading ----------------

    @classmethod
    def from_state_dict(cls, sd: Dict[str, np.ndarray]) -> "VQGANDecoder":
        """torch state dict (tensors or numpy) -> NHWC/HWIO params.

        Keeps only quantize/post_quant_conv/decoder keys (the encoder and
        discriminator in a full VQModel checkpoint are not needed)."""
        params = {}
        for k, v in sd.items():
            if not k.startswith(("quantize.", "post_quant_conv.", "decoder.")):
                continue
            arr = np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                np.float32,
            )
            if arr.ndim == 4:  # torch OIHW -> jax HWIO
                arr = arr.transpose(2, 3, 1, 0)
            params[k] = arr
        return cls(params)

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "VQGANDecoder":
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        return cls.from_state_dict(sd)

    # ---------------- forward ----------------

    def _sub(self, prefix: str) -> Dict[str, np.ndarray]:
        n = len(prefix)
        return {k[n:]: v for k, v in self.p.items() if k.startswith(prefix)}

    def _forward(self, codes):
        p = self.p
        n, g = codes.shape
        gh = int(round(g ** 0.5))
        z = jnp.take(p["quantize.embedding.weight"], codes, axis=0)
        z = z.reshape(n, gh, g // gh, self.embed_dim)
        h = _conv(z, {"weight": p["post_quant_conv.weight"],
                      "bias": p["post_quant_conv.bias"]})
        h = _conv(h, {"weight": p["decoder.conv_in.weight"],
                      "bias": p["decoder.conv_in.bias"]})
        h = _resnet_block(h, self._sub("decoder.mid.block_1."))
        h = _attn_block(h, self._sub("decoder.mid.attn_1."))
        h = _resnet_block(h, self._sub("decoder.mid.block_2."))
        # taming Decoder: up[i] is stored by level (0 = full resolution)
        # and applied lowest-resolution first
        for i in reversed(range(self.num_levels)):
            for j in range(self.blocks_per_level[i]):
                h = _resnet_block(h, self._sub(f"decoder.up.{i}.block.{j}."))
                if i in self.attn_levels:
                    h = _attn_block(h, self._sub(f"decoder.up.{i}.attn.{j}."))
            if i != 0:
                h = _upsample(
                    h,
                    {"weight": p[f"decoder.up.{i}.upsample.conv.weight"],
                     "bias": p[f"decoder.up.{i}.upsample.conv.bias"]},
                )
        h = _swish(_group_norm(h, p["decoder.norm_out.weight"],
                               p["decoder.norm_out.bias"]))
        h = _conv(h, {"weight": p["decoder.conv_out.weight"],
                      "bias": p["decoder.conv_out.bias"]})
        return h

    def decode(self, tokens: np.ndarray, grid=None) -> np.ndarray:
        """int tokens [N, G] -> uint8 images (taming [-1, 1] -> pixels).

        API-compatible with PatchVQTokenizer.decode so img_gen dumps can
        be rendered by either backend."""
        x = np.asarray(self._decode(jnp.asarray(tokens, jnp.int32)))
        return np.clip((x + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)


def decode_img_gen_dump(dump_path: str, decoder, out_dir: str,
                        token_prefix: str = "img_") -> int:
    """Render an eval img_gen dump (save_img_gen/*.json) to PNG files —
    the offline decode step of the reference flow (README.md:48).

    Returns the number of images written. Generations whose token
    count is not a full square grid are right-padded with token 0.
    """
    import json
    import os

    from PIL import Image

    with open(dump_path) as f:
        gens = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for i, g in enumerate(gens):
        text = g["generated"] if isinstance(g, dict) else str(g)
        toks = [
            int(w[len(token_prefix):].rstrip(","))
            for w in text.replace(",", ", ").split()
            if w.startswith(token_prefix)
            and w[len(token_prefix):].rstrip(",").isdigit()
        ]
        if not toks:
            continue
        side = int(np.ceil(np.sqrt(len(toks))))
        toks = (toks + [0] * (side * side - len(toks)))[: side * side]
        img = decoder.decode(np.asarray([toks], np.int32))[0]
        Image.fromarray(img).save(os.path.join(out_dir, f"gen_{i}.png"))
        written += 1
    return written
