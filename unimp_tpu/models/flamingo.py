"""UniMP model: CLIP-ViT -> perceiver resampler -> gated-xattn decoder.

The unified multimodal personalization model, re-designed TPU-first with
the same capabilities as the reference's OpenFlamingo build
(/root/reference/UniMP/mmrec.py:475-524): a frozen-able vision tower, a
perceiver resampler, and a causal LM whose every-Nth block is preceded
by a tanh-gated cross-attention block over the resampled media latents
(gates init 0 so the pretrained LM is unchanged at step 0).

Interface parity with the reference model call
(`model(vision_x, lang_x, attention_mask, labels)`, mmrec.py:177-181) is
provided at the train/eval layer; this module is pure/functional:

    latents           = model.encode_vision(vision_x)       # [B,M,L,Dv]
    logits, caches    = model(input_ids, latents=latents,
                              q_media=..., kv_len=..., ...)

Media masking: each text token cross-attends only to the latents of the
most recent preceding <image> ("immediate", Flamingo semantics); the
per-token media index `q_media` is data (cumsum of media tokens),
computed by `compute_q_media` and passed in so the module stays pure.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import UniMPConfig
from unimp_tpu.models.layers import Attention, Mlp, make_norm
from unimp_tpu.models.lm import DecoderBlock, init_layer_cache
from unimp_tpu.models.perceiver import PerceiverResampler
from unimp_tpu.models.vit import VisionTower
from unimp_tpu.ops import AttnMask


def compute_q_media(input_ids: jax.Array, media_token_id: int) -> jax.Array:
    """Per-token index of the most recent media at/preceding each position.

    The <image> token itself belongs to its media (cumsum inclusive), so
    the tokens describing item i attend to item i's latents.
    """
    return jnp.cumsum(
        (input_ids == media_token_id).astype(jnp.int32), axis=1
    )


class GatedCrossAttnBlock(nn.Module):
    """tanh-gated cross-attention + gated FF (Flamingo)."""

    num_heads: int
    head_dim: int
    ff_mult: int = 4
    media_mode: str = "immediate"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, latents_flat, q_media, kv_media):
        d = x.shape[-1]
        attn_gate = self.param("attn_gate", nn.initializers.zeros, (), jnp.float32)
        ff_gate = self.param("ff_gate", nn.initializers.zeros, (), jnp.float32)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_attn")(x)
        mask = AttnMask(q_media=q_media, kv_media=kv_media, media_mode=self.media_mode)
        attn_out, _ = Attention(
            num_heads=self.num_heads, head_dim=self.head_dim, use_bias=False,
            dtype=self.dtype, name="xattn",
        )(h, latents_flat, mask=mask)
        x = x + jnp.tanh(attn_gate).astype(self.dtype) * attn_out
        h = nn.LayerNorm(dtype=self.dtype, name="ln_ff")(x)
        ff_out = Mlp(
            hidden=self.ff_mult * d, act="gelu", use_bias=False,
            dtype=self.dtype, name="mlp",
        )(h)
        return x + jnp.tanh(ff_gate).astype(self.dtype) * ff_out


class UniMPModel(nn.Module):
    cfg: UniMPConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.vision = VisionTower(cfg.vision, dtype=dt)
        self.resampler = PerceiverResampler(cfg.resampler, dtype=dt)
        self.embed = nn.Embed(
            cfg.lm.vocab_size, cfg.lm.hidden_size, dtype=dt,
            param_dtype=jnp.float32, name="embed",
        )
        blocks, xattns = [], []
        for i in range(cfg.lm.num_layers):
            if i % cfg.cross_attn_every_n == 0:
                xattns.append(
                    GatedCrossAttnBlock(
                        num_heads=cfg.lm.num_heads, head_dim=cfg.lm.head_dim,
                        media_mode=cfg.media_mode, dtype=dt,
                        name=f"xattn_{i}",
                    )
                )
            else:
                xattns.append(None)
            blocks.append(DecoderBlock(cfg.lm, dtype=dt, name=f"block_{i}"))
        self.blocks = blocks
        self.xattns = xattns
        self.final_ln = make_norm(
            cfg.lm.norm, cfg.lm.layernorm_eps, dt, "final_ln"
        )
        if not cfg.lm.tie_embeddings:
            self.lm_head = nn.Dense(
                cfg.lm.vocab_size, use_bias=False, dtype=jnp.float32,
                param_dtype=jnp.float32, name="lm_head",
            )

    def encode_vision(self, vision_x: jax.Array) -> jax.Array:
        """[B, M, H, W, 3] CLIP-normalized -> latents [B, M, L, Dv]."""
        b, m = vision_x.shape[:2]
        flat = vision_x.reshape((b * m,) + vision_x.shape[2:])
        feats = self.vision(flat)  # [B*M, P, Dv]
        lat = self.resampler(feats)  # [B*M, L, Dv]
        return lat.reshape(b, m, lat.shape[1], lat.shape[2])

    def __call__(
        self,
        input_ids: jax.Array,
        *,
        latents: Optional[jax.Array] = None,
        vision_x: Optional[jax.Array] = None,
        q_media: Optional[jax.Array] = None,
        kv_len: Optional[jax.Array] = None,
        kv_start: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        caches: Optional[list] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        """Returns (logits [B, S, V] float32, new_caches_or_None).

        Exactly one of `latents` (pre-encoded) / `vision_x` (raw pixels)
        must be given unless the model is used text-only.
        """
        cfg = self.cfg
        if latents is None and vision_x is not None:
            latents = self.encode_vision(vision_x)

        latents_flat = kv_media = None
        if latents is not None:
            b, m, l, dv = latents.shape
            latents_flat = latents.reshape(b, m * l, dv)
            kv_media = jnp.broadcast_to(
                jnp.repeat(jnp.arange(1, m + 1, dtype=jnp.int32), l)[None, :],
                (b, m * l),
            )
            if q_media is None:
                raise ValueError("q_media required when media is present")

        x = self.embed(input_ids)
        causal = input_ids.shape[1] > 1
        new_caches = [] if caches is not None else None
        for i, (block, xattn) in enumerate(zip(self.blocks, self.xattns)):
            if xattn is not None and latents_flat is not None:
                x = xattn(x, latents_flat, q_media, kv_media)
            cache = caches[i] if caches is not None else None
            x, nc = block(
                x, kv_len=kv_len, kv_start=kv_start, positions=positions,
                cache=cache, cache_index=cache_index, causal=causal,
            )
            if new_caches is not None:
                new_caches.append(nc)
        x = self.final_ln(x)
        if cfg.lm.tie_embeddings:
            logits = self.embed.attend(x.astype(jnp.float32))
        else:
            logits = self.lm_head(x.astype(jnp.float32))
        return logits, new_caches

    def init_caches(self, batch: int, max_len: int):
        return [
            init_layer_cache(batch, max_len, self.cfg.lm, self.cfg.compute_dtype)
            for _ in range(self.cfg.lm.num_layers)
        ]
