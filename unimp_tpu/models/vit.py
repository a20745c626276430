"""CLIP-style ViT vision tower (Flax, flash-attention backed).

TPU-native re-design of the reference's xformers CLIP vision model
(/root/reference/UniMP/xformers_model/clip.py:416-543): the stride-14
patch conv is expressed as reshape+matmul (identical math, maps straight
onto the MXU instead of a convolution), attention runs through the
shared Pallas flash kernel, and the tower returns the final-layer patch
tokens (CLS dropped) as Flamingo consumes them.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import VisionConfig
from unimp_tpu.models.layers import Attention, Mlp


class ViTBlock(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=self.dtype, name="ln1")(x)
        attn_out, _ = Attention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, use_bias=True,
            dtype=self.dtype, name="attn",
        )(h)
        x = x + attn_out
        h = nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=self.dtype, name="ln2")(x)
        x = x + Mlp(
            hidden=cfg.mlp_ratio * cfg.hidden_size, act="gelu", quick_gelu=True,
            use_bias=True, dtype=self.dtype, name="mlp",
        )(h)
        return x


class VisionTower(nn.Module):
    """pixel_values [B, H, W, 3] (CLIP-normalized) -> patch tokens [B, P, D]."""

    cfg: VisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, hh, ww, c = pixel_values.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        # Patchify: stride-p conv == reshape to [B, P, p*p*3] @ W.
        x = pixel_values.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="patch_embed",
        )(x.astype(self.dtype))

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, cfg.hidden_size), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=self.dtype, name="pre_ln")(x)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"block_{i}")(x)
        # Reference parity (clip.py:469-471): post_layernorm is applied to
        # the pooled CLS token ONLY — the last_hidden_state that Flamingo
        # consumes (`vision_encoder(...)[0][:, 1:]`) is NOT post-normed.
        # The norm still runs on the (discarded) CLS slice so its params
        # exist for checkpoint conversion.
        nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=self.dtype,
                     name="post_ln")(x[:, :1])
        return x[:, 1:]
