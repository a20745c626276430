"""XLA reference attention.

Ground-truth (and CPU/GPU fallback) implementation of every attention
pattern the framework needs. The Pallas kernels in
``unimp_tpu/ops/flash_attention.py`` are tested for exact agreement with
these functions.

Patterns (replacing the reference's xformers CUDA calls — see
/root/reference/UniMP/xformers_model/llama.py:286-301 (causal self-attn),
clip.py:130 (bidirectional ViT attn) and open_flamingo's masked gated
cross-attention):

  * causal self-attention with key padding mask (decoder)
  * bidirectional self-attention (ViT / perceiver)
  * media-masked cross-attention: text queries attend to per-media latent
    groups, either only the immediately-preceding media ("immediate") or
    all preceding media ("all_previous").

All functions take [B, S, H, D] layout (batch, seq, heads, head_dim) —
the natural layout for TPU (last dim = lanes = head_dim, second-to-last
= sublanes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large finite negative: avoids NaNs from (-inf) - (-inf)


@dataclasses.dataclass(frozen=True)
class AttnMask:
    """Declarative attention-mask spec shared by XLA and Pallas paths.

    Attributes:
      causal: apply a lower-triangular mask over (q_pos, kv_pos).
      q_media: [B, Sq] int32 — index of the most recent media at/preceding
        each query position (0 = before any media). Used for cross-attn.
      kv_media: [B, Skv] int32 — 1-based media index of each KV latent.
      media_mode: None | "immediate" | "all_previous".
      kv_valid: [B, Skv] bool — False masks out the KV position entirely
        (padding). Queries are never masked (garbage-in/garbage-out rows
        are dropped by the caller's loss/logit masking).
    """

    causal: bool = False
    q_media: Optional[jax.Array] = None
    kv_media: Optional[jax.Array] = None
    media_mode: Optional[str] = None
    kv_valid: Optional[jax.Array] = None

    def bias(self, b: int, sq: int, skv: int, dtype=jnp.float32) -> Optional[jax.Array]:
        """Materialize as an additive [B, 1, Sq, Skv] bias (0 or NEG_INF)."""
        allowed = None

        def _and(a, m):
            return m if a is None else jnp.logical_and(a, m)

        if self.causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
            allowed = _and(allowed, (ki <= qi)[None, :, :])
        if self.media_mode is not None:
            qm = self.q_media[:, :, None]  # [B, Sq, 1]
            km = self.kv_media[:, None, :]  # [B, 1, Skv]
            if self.media_mode == "immediate":
                allowed = _and(allowed, qm == km)
            elif self.media_mode == "all_previous":
                allowed = _and(allowed, jnp.logical_and(km <= qm, km > 0))
            else:
                raise ValueError(f"unknown media_mode: {self.media_mode}")
        if self.kv_valid is not None:
            allowed = _and(allowed, self.kv_valid[:, None, :])
        if allowed is None:
            return None
        allowed = jnp.broadcast_to(allowed, (b, sq, skv))
        return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[:, None, :, :]


def alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi slopes: geometric sequence 2^(-8i/n) (press et al.)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    n = num_heads
    if math.log2(n).is_integer():
        vals = pow2_slopes(n)
    else:
        closest = 2 ** math.floor(math.log2(n))
        vals = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2][: n - closest]
        vals = vals + extra
    return jnp.asarray(vals, jnp.float32)


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[AttnMask] = None,
    scale: Optional[float] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference scaled-dot-product attention.

    Args:
      q: [B, Sq, H, D]
      k: [B, Skv, Hkv, D]  (Hkv == H or 1 for multi-query)
      v: [B, Skv, Hkv, D]
      mask: optional AttnMask.
      scale: softmax scale; default 1/sqrt(D).

    Returns [B, Sq, H, D] in q.dtype.
    """
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    if hkv != h:
        assert h % hkv == 0, (h, hkv)
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    if scale is None:
        scale = 1.0 / (d**0.5)
    # [B, H, Sq, Skv] logits in f32 for a numerically-stable softmax.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if alibi is not None:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        logits = logits + alibi[None, :, None, None] * (ki - qi).astype(
            jnp.float32
        )
    if mask is not None:
        bias = mask.bias(b, sq, skv)
        if bias is not None:
            logits = logits + bias
    # Rows that are fully masked (all NEG_INF) softmax to uniform garbage;
    # clamp so they produce zeros instead (matches flash kernel l=0 → 0).
    probs = jax.nn.softmax(logits, axis=-1)
    fully_masked = jnp.max(logits, axis=-1, keepdims=True) <= NEG_INF / 2
    probs = jnp.where(fully_masked, 0.0, probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)
