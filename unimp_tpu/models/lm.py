"""Decoder-only causal LM blocks (Flax), configurable across families.

One parameterized block covers the reference's backbones (see
/root/reference/UniMP/mmrec.py:475-524): MPT (layernorm+ALiBi,
sequential residual, no biases), GPT-NeoX/RedPajama (layernorm+partial
RoPE, parallel attn+mlp residual, biases), and LLaMA-style
(RMSNorm+RoPE+SwiGLU) for the framework's own configs. Self-attention
runs through the shared Pallas flash kernel in full/prefill mode and
through the split-cache decode op during generation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.models.config import LMConfig
from unimp_tpu.models.layers import Attention, DenseWeights, Mlp, make_norm
from unimp_tpu.ops import AttnMask
from unimp_tpu.ops.quant_matmul import quant_dot


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
        causal: bool = True,
        return_cache: bool = False,
        decode_state: Optional[dict] = None,
    ):
        """Returns (x, cache): prompt KV when return_cache, updated gen
        cache in decode mode, else None."""
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
        mask = AttnMask(causal=causal and decode_state is None)
        kwargs = dict(
            mask=mask, kv_len=kv_len, kv_start=kv_start, positions=positions,
            return_cache=return_cache, decode_state=decode_state,
        )
        if cfg.parallel_block:
            # NeoX: x + attn(ln1 x) + mlp(ln2 x)
            h1 = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln1")(x)
            attn_out, cache = attn(h1, **kwargs)
            h2 = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln2")(x)
            mlp_out = Mlp(
                hidden=cfg.mlp_dim, act=cfg.act, use_bias=cfg.use_bias,
                dtype=self.dtype, name="mlp",
            )(h2, fuse=decode_state is not None)
            return x + attn_out + mlp_out, cache
        h = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln1")(x)
        attn_out, cache = attn(h, **kwargs)
        x = x + attn_out
        h = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "ln2")(x)
        x = x + Mlp(
            hidden=cfg.mlp_dim, act=cfg.act, use_bias=cfg.use_bias,
            dtype=self.dtype, name="mlp",
        )(h, fuse=decode_state is not None)
        return x, cache


def init_gen_cache(batch: int, max_new: int, cfg: LMConfig, dtype=jnp.bfloat16,
                   quantized: bool = False):
    """Per-layer generated-token KV cache, SPLIT K and V arrays
    [B*, Hkv, max_new, D].

    Split beats the earlier merged [2, B*, Hkv, max_new, D] layout
    decisively on TPU: the attention consumes `merged[0]` / `merged[1]`,
    and a dot_general operand cannot fuse a slice, so XLA materialized
    full copies of both cache halves per layer per step (~0.36 ms/layer
    at the 4b decode shapes — benchmarks/cache_layout_probe.py, merged
    5.11 vs split 2.25 ms per 8-layer sweep). The extra DUS write of the
    split layout costs ~nothing; decode is HBM-bound, not launch-bound.

    Heads-major ([.., Hkv, max_new, D], not [.., max_new, Hkv, D]): the
    fused Pallas decode kernel blocks one (batch, head) slab per grid
    step, and Pallas can only slice the last two array dims at tile
    granularity — the head axis must sit ahead of (seq, head_dim). XLA's
    einsum path is layout-neutral here (benchmarks/attn_layout_probe.py).

    quantized: int8 storage + per-(head, position) f32 scales — decode
    streams the whole padded cache every step, so halving its bytes
    shaves HBM-bound step time (see decode_attention docstring)."""
    shape = (batch, cfg.kv_heads, max_new, cfg.head_dim)
    if quantized:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


class CausalLM(nn.Module):
    """Pure-text causal LM (the multimodal model in flamingo.py builds
    its own interleaved stack); supports the same prefill/decode API."""

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
        return_kv: bool = False,
        decode_state: Optional[dict] = None,
    ):
        cfg = self.cfg
        embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed",
        )
        x = embed(input_ids)
        caches = []
        for i in range(cfg.num_layers):
            layer_ds = None
            if decode_state is not None:
                layer_ds = {
                    "prompt": decode_state["self"][i],
                    "gen": decode_state["gen"][i],
                    "step": decode_state["step"],
                    "kv_start": decode_state.get("kv_start"),
                    "gen_index": decode_state.get("gen_index"),
                }
            x, cache = DecoderBlock(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, kv_len=kv_len, kv_start=kv_start, positions=positions,
                causal=input_ids.shape[1] > 1,
                return_cache=return_kv, decode_state=layer_ds,
            )
            caches.append(cache)
        x = make_norm(cfg.norm, cfg.layernorm_eps, self.dtype, "final_ln")(x)
        if cfg.tie_embeddings:
            emb = embed.embedding.astype(x.dtype)
            logits = jax.lax.dot_general(
                x, emb,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # nn.Dense-identical params; quant_dot streams int8 bytes
            # when the kernel is quantized (decode row counts)
            lk, _ = DenseWeights(
                cfg.vocab_size, use_bias=False, name="lm_head",
            ).weights(x.shape[-1])
            logits = quant_dot(x.astype(self.dtype), lk).astype(jnp.float32)
        if return_kv:
            return logits, {"self": caches}
        if decode_state is not None:
            return logits, caches  # updated gen caches
        return logits, None
