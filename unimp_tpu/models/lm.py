"""Decoder-only causal LM blocks (Flax), configurable across families.

One parameterized block covers the reference's backbones (see
/root/reference/UniMP/mmrec.py:475-524): MPT (layernorm+ALiBi,
sequential residual, no biases), GPT-NeoX/RedPajama (layernorm+partial
RoPE, parallel attn+mlp residual, biases), and LLaMA-style
(RMSNorm+RoPE+SwiGLU) for the framework's own configs. Self-attention
runs through the shared Pallas flash kernel; KV caches are functional
(passed in / returned) for jit-able decode loops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import LMConfig
from unimp_tpu.models.layers import Attention, Mlp, make_norm
from unimp_tpu.ops import AttnMask


class DecoderBlock(nn.Module):
    cfg: LMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        kv_len: Optional[jax.Array] = None,
        kv_start: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
        cache_index: Optional[jax.Array] = None,
        causal: bool = True,
    ):
        cfg = self.cfg
        attn = Attention(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            num_kv_heads=cfg.kv_heads,
            use_bias=cfg.use_bias,
            positions_mode=cfg.positions,
            rotary_pct=cfg.rotary_pct,
            rope_theta=cfg.rope_theta,
            dtype=self.dtype,
            name="attn",
        )
        mask = AttnMask(causal=causal)
        if cfg.parallel_block:
            # NeoX: x + attn(ln1 x) + mlp(ln2 x)
            h1 = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln1")(x)
            attn_out, new_cache = attn(
                h1, mask=mask, kv_len=kv_len, kv_start=kv_start,
                positions=positions, cache=cache, cache_index=cache_index,
            )
            h2 = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln2")(x)
            mlp_out = Mlp(
                hidden=cfg.mlp_dim, act=cfg.act, use_bias=cfg.use_bias,
                dtype=self.dtype, name="mlp",
            )(h2)
            return x + attn_out + mlp_out, new_cache
        h = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln1")(x)
        attn_out, new_cache = attn(
            h, mask=mask, kv_len=kv_len, kv_start=kv_start,
            positions=positions, cache=cache, cache_index=cache_index,
        )
        x = x + attn_out
        h = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln2")(x)
        x = x + Mlp(
            hidden=cfg.mlp_dim, act=cfg.act, use_bias=cfg.use_bias,
            dtype=self.dtype, name="mlp",
        )(h)
        return x, new_cache


def init_layer_cache(batch: int, max_len: int, cfg: LMConfig, dtype=jnp.bfloat16):
    return {
        "k": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
        "v": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
    }


class CausalLM(nn.Module):
    """Pure-text causal LM (used standalone in tests; the multimodal
    model in flamingo.py builds its own interleaved stack)."""

    cfg: LMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        *,
        kv_len: Optional[jax.Array] = None,
        kv_start: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        caches: Optional[list] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        cfg = self.cfg
        embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed",
        )
        x = embed(input_ids)
        new_caches = [] if caches is not None else None
        for i in range(cfg.num_layers):
            cache = caches[i] if caches is not None else None
            # Causal masking matters only for multi-token inputs; the
            # kernel's causal offset assumes the q chunk starts at kv
            # position 0, which holds for prefill (cache_index == 0).
            # Single-token decode steps attend the whole valid prefix.
            x, nc = DecoderBlock(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, kv_len=kv_len, kv_start=kv_start, positions=positions,
                cache=cache, cache_index=cache_index,
                causal=input_ids.shape[1] > 1,
            )
            if new_caches is not None:
                new_caches.append(nc)
        x = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "final_ln")(x)
        if cfg.tie_embeddings:
            logits = embed.attend(x.astype(jnp.float32))
        else:
            logits = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                param_dtype=jnp.float32, name="lm_head",
            )(x.astype(jnp.float32))
        return logits, new_caches
