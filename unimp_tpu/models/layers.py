"""Shared Flax layers: norms, rotary embeddings, MLPs, attention blocks.

These are the building blocks for the vision tower, perceiver resampler
and decoder LM. All matmuls run in the configured compute dtype
(bfloat16 on TPU) with float32 params.

Attention has two modes:
  * full (training / prefill): Pallas flash kernel; optionally returns
    the projected K/V as the prompt cache.
  * decode: single-token step against a SPLIT cache — shared prompt KV
    [B, T] plus per-beam generated KV [B*K, G] — via
    unimp_tpu.ops.decode_attention (see that module for why).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.ops import AttnMask, multi_head_attention
from unimp_tpu.ops.decode_attention import decode_attention, single_query_attention

Dtype = Any


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


def make_norm(kind: str, eps: float, dtype: Dtype, name: str):
    if kind == "rmsnorm":
        return RMSNorm(eps=eps, dtype=dtype, name=name)
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=eps, dtype=dtype, name=name)
    raise ValueError(f"unknown norm {kind!r}")


def rope_frequencies(head_dim: int, rotary_pct: float, theta: float):
    """Static per-dimension inverse frequencies for NeoX-style RoPE."""
    rot_dim = int(head_dim * rotary_pct)
    rot_dim -= rot_dim % 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    return inv_freq, rot_dim


def apply_rope(x: jax.Array, positions: jax.Array, rotary_pct: float, theta: float):
    """NeoX-style rotary embedding over the leading rotary_pct of head_dim.

    x: [B, S, H, D]; positions: [B, S] int32 absolute positions.
    """
    d = x.shape[-1]
    inv_freq, rot_dim = rope_frequencies(d, rotary_pct, theta)
    if rot_dim == 0:
        return x
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, rot/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x_rot[..., : rot_dim // 2], x_rot[..., rot_dim // 2 :]
    # NeoX half-split rotation: (x1, x2) -> (x1 cos - x2 sin, x2 cos + x1 sin)
    r1 = x1.astype(jnp.float32) * cos - x2.astype(jnp.float32) * sin
    r2 = x2.astype(jnp.float32) * cos + x1.astype(jnp.float32) * sin
    rotated = jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
    return jnp.concatenate([rotated, x_pass], axis=-1)


class Mlp(nn.Module):
    """Transformer MLP; act="silu" selects a SwiGLU (gate*up) block."""

    hidden: int
    act: str = "gelu"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    quick_gelu: bool = False  # CLIP uses x*sigmoid(1.702x)

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        if self.act == "silu":
            gate = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                            param_dtype=jnp.float32, name="gate")(x)
            up = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                          param_dtype=jnp.float32, name="up")(x)
            h = nn.silu(gate) * up
        else:
            h = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                         param_dtype=jnp.float32, name="up")(x)
            if self.quick_gelu:
                h = h * nn.sigmoid(1.702 * h)
            else:
                h = nn.gelu(h, approximate=True)
        return nn.Dense(d_model, use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name="down")(h)


class Attention(nn.Module):
    """Multi-head attention over [B, S, H, D] with split-cache decode.

    Self-attention: pass only ``x`` (+ positions for RoPE).
    Cross-attention: pass ``kv_x`` (e.g. resampled media latents), or a
    precomputed ``xattn_cache`` during decode.
    """

    num_heads: int
    head_dim: int
    num_kv_heads: Optional[int] = None
    out_dim: Optional[int] = None
    use_bias: bool = True
    positions_mode: str = "none"  # "rope" | "alibi" | "none"
    rotary_pct: float = 1.0
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.bfloat16

    def _alibi(self):
        from unimp_tpu.ops.attention_ref import alibi_slopes

        return alibi_slopes(self.num_heads)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv_x: Optional[jax.Array] = None,
        *,
        mask: Optional[AttnMask] = None,
        kv_len: Optional[jax.Array] = None,
        kv_start: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        return_cache: bool = False,
        decode_state: Optional[dict] = None,
        xattn_cache: Optional[dict] = None,
        xattn_allowed: Optional[jax.Array] = None,
    ):
        """Returns (out [B, S, out_dim], cache_or_None).

        decode_state (self-attn decode): {"prompt": {"k","v"} [B,T,..],
        "gen": {"k","v"} [BK,G,..], "step": scalar tokens generated so
        far (current token excluded), "kv_start": [B]}.
        xattn_cache (cross-attn decode): {"k","v"} [B,S,..] projected
        latents; xattn_allowed: [B, S] mask.
        """
        h, d = self.num_heads, self.head_dim
        hkv = self.num_kv_heads or h
        dense = lambda feats, name: nn.DenseGeneral(  # noqa: E731
            feats, axis=-1, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        q = dense((h, d), "q_proj")(x)

        out_dim = self.out_dim or x.shape[-1]
        o_proj = nn.DenseGeneral(
            out_dim, axis=(-2, -1), use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="o_proj",
        )

        # ---- cross-attention decode against cached projected latents
        if xattn_cache is not None:
            out = single_query_attention(
                q[:, 0], xattn_cache["k"], xattn_cache["v"], xattn_allowed
            )
            return o_proj(out[:, None]), None

        kv_src = x if kv_x is None else kv_x
        k = dense((hkv, d), "k_proj")(kv_src)
        v = dense((hkv, d), "v_proj")(kv_src)

        alibi = None
        if self.positions_mode == "rope":
            if positions is None:
                positions = jnp.broadcast_to(
                    jnp.arange(x.shape[1], dtype=jnp.int32)[None], x.shape[:2]
                )
            q = apply_rope(q, positions, self.rotary_pct, self.rope_theta)
            k = apply_rope(k, positions, self.rotary_pct, self.rope_theta)
        elif self.positions_mode == "alibi":
            alibi = self._alibi()

        # ---- self-attention decode: split prompt/gen cache
        if decode_state is not None:
            step = decode_state["step"]
            gen_k = jax.lax.dynamic_update_slice(
                decode_state["gen"]["k"], k.astype(decode_state["gen"]["k"].dtype),
                (0, step, 0, 0),
            )
            gen_v = jax.lax.dynamic_update_slice(
                decode_state["gen"]["v"], v.astype(decode_state["gen"]["v"].dtype),
                (0, step, 0, 0),
            )
            out = decode_attention(
                q[:, 0],
                decode_state["prompt"]["k"],
                decode_state["prompt"]["v"],
                gen_k,
                gen_v,
                step=step + 1,
                kv_start=decode_state.get("kv_start"),
                alibi=alibi,
            )
            return o_proj(out[:, None]), {"k": gen_k, "v": gen_v}

        # ---- full / prefill
        out = multi_head_attention(
            q, k, v, mask, kv_len=kv_len, kv_start=kv_start, alibi=alibi,
        )
        cache = {"k": k, "v": v} if return_cache else None
        return o_proj(out), cache
