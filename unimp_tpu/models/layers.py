"""Shared Flax layers: norms, rotary embeddings, MLPs, attention blocks.

These are the building blocks for the vision tower, perceiver resampler
and decoder LM. All matmuls run in the configured compute dtype
(bfloat16 on TPU) with float32 params; attention dispatches to the
Pallas flash kernel via unimp_tpu.ops.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.ops import AttnMask, multi_head_attention

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
    """Multi-head attention with optional KV cache and every mask mode.

    Self-attention: pass only ``x`` (+ positions for RoPE).
    Cross-attention: pass ``kv_x`` (e.g. resampled media latents).
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
        cache: Optional[dict] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        """Returns (out [B, S, out_dim], new_cache_or_None)."""
        kv_src = x if kv_x is None else kv_x
        h, d = self.num_heads, self.head_dim
        hkv = self.num_kv_heads or h
        dense = lambda feats, name: nn.DenseGeneral(  # noqa: E731
            feats, axis=-1, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        q = dense((h, d), "q_proj")(x)
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
            from unimp_tpu.ops.attention_ref import alibi_slopes

            alibi = alibi_slopes(h)

        new_cache = None
        if cache is not None:
            # cache: {"k": [B, Smax, Hkv, D], "v": ...}; write at cache_index.
            idx = cache_index if cache_index is not None else jnp.int32(0)
            ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                              (0, idx, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                              (0, idx, 0, 0))
            new_cache = {"k": ck, "v": cv}
            k, v = ck, cv
            # valid KV prefix = tokens written so far
            written = idx + x.shape[1]
            if kv_len is None:
                kv_len = jnp.full((x.shape[0],), written, jnp.int32)
            else:
                kv_len = jnp.minimum(kv_len, written)

        out = multi_head_attention(
            q, k, v, mask, kv_len=kv_len, kv_start=kv_start, alibi=alibi,
        )
        out_dim = self.out_dim or x.shape[-1]
        out = nn.DenseGeneral(
            out_dim, axis=(-2, -1), use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="o_proj",
        )(out)
        return out, new_cache
