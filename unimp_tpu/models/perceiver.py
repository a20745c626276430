"""Perceiver resampler: variable patch tokens -> fixed media latents.

Flamingo-style (open_flamingo's PerceiverResampler, consumed by the
reference via `create_model_and_transforms`, /root/reference/UniMP/
mmrec.py:475-524): a learned set of latents cross-attends to the patch
tokens of one media item; each block's KV set is [patch tokens ;
latents]. Runs per-media (batch dim folds B*n_media), so no masking is
needed — every media is resampled independently, TPU-friendly static
shapes throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import ResamplerConfig
from unimp_tpu.models.layers import Attention, Mlp


class ResamplerBlock(nn.Module):
    cfg: ResamplerConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, latents, media):
        cfg = self.cfg
        d = latents.shape[-1]
        h_lat = nn.LayerNorm(dtype=self.dtype, name="ln_latents")(latents)
        h_media = nn.LayerNorm(dtype=self.dtype, name="ln_media")(media)
        kv = jnp.concatenate([h_media, h_lat], axis=1)
        attn_out, _ = Attention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, use_bias=False,
            dtype=self.dtype, name="attn",
        )(h_lat, kv)
        latents = latents + attn_out
        h = nn.LayerNorm(dtype=self.dtype, name="ln_ff")(latents)
        latents = latents + Mlp(
            hidden=cfg.ff_mult * d, act="gelu", use_bias=False,
            dtype=self.dtype, name="mlp",
        )(h)
        return latents


class PerceiverResampler(nn.Module):
    """media tokens [B*, P, D] -> latents [B*, num_latents, D]."""

    cfg: ResamplerConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, media: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, _, d = media.shape
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (cfg.num_latents, d),
            jnp.float32,
        )
        x = jnp.broadcast_to(
            latents.astype(self.dtype)[None], (b, cfg.num_latents, d)
        )
        for i in range(cfg.depth):
            x = ResamplerBlock(cfg, dtype=self.dtype, name=f"block_{i}")(x, media)
        return nn.LayerNorm(dtype=self.dtype, name="out_ln")(x)
