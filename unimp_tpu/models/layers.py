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

Decode steps are kernel-launch bound (tiny matmuls), so the q/k/v
projections fuse into ONE matmul (and the SwiGLU gate/up pair into one)
— the weight concatenations are loop-invariant and hoisted out of the
decode while-loop by XLA. Projection parameters are declared explicitly
with DenseGeneral-compatible names/shapes (q_proj/kernel [D, H, d] etc.)
so checkpoints and sharding rules are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unimp_tpu.ops import AttnMask, multi_head_attention
from unimp_tpu.ops.decode_attention import decode_attention, single_query_attention
from unimp_tpu.ops.quant_matmul import quant_dot
from unimp_tpu.utils.quant import QuantizedKernel, concat_kernels_int8

Dtype = Any


def _fused_kernel_dot(x, kernels):
    """x @ concat(kernels, axis=1) for 2-D kernels that may be
    QuantizedKernel leaves. All-quantized fusions concat the int8
    payloads + scales (no dequant) and stream through the Pallas
    weight-streaming matmul at decode row counts; otherwise the concat
    dequantizes to x.dtype (loop-invariant: XLA hoists it out of the
    decode while-loop)."""
    if len(kernels) > 1 and all(
            isinstance(k, QuantizedKernel) for k in kernels):
        return quant_dot(x, concat_kernels_int8(kernels))
    if len(kernels) == 1:
        return quant_dot(x, kernels[0])
    wk = jnp.concatenate([k.astype(x.dtype) for k in kernels], axis=1)
    return x @ wk


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


class Proj(nn.Module):
    """Explicit DenseGeneral-equivalent projection (kernel [in, H, d]).

    Param tree matches nn.DenseGeneral(features=(H, d)) exactly so the
    checkpoint converter and sharding rules stay valid, while giving the
    owner module direct access to the weights for fusion.
    """

    heads: int
    head_dim: int
    use_bias: bool

    @nn.compact
    def weights(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.heads, self.head_dim), jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros,
                (self.heads, self.head_dim), jnp.float32,
            )
        return kernel, bias

    def __call__(self, x):
        kernel, bias = self.weights(x.shape[-1])
        y = _fused_kernel_dot(x, [kernel.reshape(x.shape[-1], -1)])
        y = y.reshape(*y.shape[:-1], self.heads, self.head_dim)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class DenseWeights(nn.Module):
    """Explicit nn.Dense-equivalent weights (kernel [in, F], bias [F]) —
    same param tree as nn.Dense, but the owner can fuse the matmuls."""

    features: int
    use_bias: bool

    @nn.compact
    def weights(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.features), jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return kernel, bias


class OProj(nn.Module):
    """Explicit nn.DenseGeneral(axis=(-2,-1))-equivalent output
    projection: kernel [H, d, out], bias [out], flattened-fan
    lecun_normal init — the exact param tree and statistics of the
    DenseGeneral it replaces, with the matmul routed through quant_dot
    so int8 kernels stream int8 bytes on the decode path."""

    out_dim: int
    use_bias: bool
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y):  # [..., H, D] -> [..., out_dim]
        h, d = y.shape[-2], y.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(
                key, (shape[0] * shape[1], shape[2]), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", init, (h, d, self.out_dim),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_dim,), jnp.float32)
                if self.use_bias else None)
        y2 = y.reshape(*y.shape[:-2], h * d).astype(self.dtype)
        if (isinstance(kernel, QuantizedKernel)
                and kernel.scale.size == self.out_dim):
            k2 = QuantizedKernel(kernel.q.reshape(h * d, self.out_dim),
                                 kernel.scale.reshape(-1),
                                 dtype=kernel.dtype)
        else:  # plain array, or a scale the flat matmul can't fold
            k2 = kernel.reshape(h * d, self.out_dim)
        out = quant_dot(y2, k2)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


class Mlp(nn.Module):
    """Transformer MLP; act="silu" selects a SwiGLU (gate*up) block.

    fuse=True (decode path) runs gate+up as one matmul.
    """

    hidden: int
    act: str = "gelu"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    quick_gelu: bool = False  # CLIP uses x*sigmoid(1.702x)

    @nn.compact
    def __call__(self, x, fuse: bool = False):
        d_model = x.shape[-1]
        if self.act == "silu":
            gk, gb = DenseWeights(self.hidden, self.use_bias, name="gate").weights(d_model)
            uk, ub = DenseWeights(self.hidden, self.use_bias, name="up").weights(d_model)
            if fuse:
                y = _fused_kernel_dot(x, [gk, uk])
                if gb is not None:
                    y = y + jnp.concatenate([gb, ub]).astype(y.dtype)
                gate, up = jnp.split(y, 2, axis=-1)
            else:
                gate = quant_dot(x, gk)
                up = quant_dot(x, uk)
                if gb is not None:
                    gate = gate + gb.astype(gate.dtype)
                    up = up + ub.astype(up.dtype)
            h = nn.silu(gate) * up
        else:
            # explicit weights, nn.Dense-identical param tree — the
            # matmul must route through quant_dot so int8 kernels
            # stream int8 bytes at decode (see ops/quant_matmul.py)
            uk, ub = DenseWeights(self.hidden, self.use_bias, name="up").weights(d_model)
            h = quant_dot(x.astype(self.dtype), uk)
            if ub is not None:
                h = h + ub.astype(h.dtype)
            if self.quick_gelu:
                h = h * nn.sigmoid(1.702 * h)
            else:
                h = nn.gelu(h, approximate=True)
        dk, db = DenseWeights(d_model, self.use_bias, name="down").weights(
            h.shape[-1])
        out = quant_dot(h.astype(self.dtype), dk)
        if db is not None:
            out = out + db.astype(out.dtype)
        return out


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
        attn_impl: Optional[str] = None,
    ):
        """Returns (out [B, S, out_dim], cache_or_None).

        decode_state (self-attn decode): {"prompt": {"k","v"}
        [B,Hkv,T,D], "gen": {"k","v"} [BK,Hkv,G,D], "step": scalar tokens
        generated so far (current token excluded), "kv_start": [B]}.
        xattn_cache (cross-attn decode): {"k","v"} [B,Hkv,S,D] projected
        latents; xattn_allowed: [B, S] mask. All decode caches are
        heads-major (see init_gen_cache).
        """
        h, d = self.num_heads, self.head_dim
        hkv = self.num_kv_heads or h
        in_dim = x.shape[-1]
        q_p = Proj(h, d, self.use_bias, name="q_proj")
        k_p = Proj(hkv, d, self.use_bias, name="k_proj")
        v_p = Proj(hkv, d, self.use_bias, name="v_proj")

        out_dim = self.out_dim or x.shape[-1]
        o_proj = OProj(out_dim, use_bias=self.use_bias, dtype=self.dtype,
                       name="o_proj")

        # ---- cross-attention decode against cached projected latents
        if xattn_cache is not None:
            q = q_p(x)
            out = single_query_attention(
                q[:, 0], xattn_cache["k"], xattn_cache["v"], xattn_allowed,
                k_scale=xattn_cache.get("k_scale"),  # int8 latent KV
                v_scale=xattn_cache.get("v_scale"),
                impl=attn_impl,
            )
            return o_proj(out[:, None]), None

        kv_src = x if kv_x is None else kv_x
        same_src = kv_x is None

        if decode_state is not None and same_src:
            # fused single-matmul qkv (int8 kernels stream int8 bytes
            # through the Pallas matmul; float kernels concat once,
            # hoisted out of the loop)
            qk, qb = q_p.weights(in_dim)
            kk, kb = k_p.weights(in_dim)
            vk, vb = v_p.weights(in_dim)
            y = _fused_kernel_dot(
                x, [qk.reshape(in_dim, -1), kk.reshape(in_dim, -1),
                    vk.reshape(in_dim, -1)],
            )
            if qb is not None:
                y = y + jnp.concatenate(
                    [qb.reshape(-1), kb.reshape(-1), vb.reshape(-1)]
                ).astype(y.dtype)
            b_, s_ = x.shape[:2]
            q, k, v = jnp.split(y, [h * d, h * d + hkv * d], axis=-1)
            q = q.reshape(b_, s_, h, d)
            k = k.reshape(b_, s_, hkv, d)
            v = v.reshape(b_, s_, hkv, d)
        else:
            q = q_p(x)
            k = k_p(kv_src)
            v = v_p(kv_src)

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
            gen = decode_state["gen"]
            # caches are heads-major ([B*, Hkv, S, D], SPLIT K/V — see
            # init_gen_cache: merged [2,...] forced XLA to materialize
            # both cache halves per layer since dot_general operands
            # can't fuse a slice); the new token arrives [B*, 1, Hkv, D]
            k_new = k.transpose(0, 2, 1, 3)
            v_new = v.transpose(0, 2, 1, 3)
            gen_scales = (None, None)
            if gen["k"].dtype == jnp.int8:
                # int8 gen cache: quantize the new token per (k/v, head);
                # the raw int8 cache + scales flow into decode_attention,
                # which dequantizes in VMEM (Pallas) or fused (XLA) — the
                # HBM stream is the int8 bytes either way
                new_cache = {}
                for name, t_new in (("k", k_new), ("v", v_new)):
                    amax = jnp.max(jnp.abs(t_new.astype(jnp.float32)),
                                   axis=-1, keepdims=True)
                    t_scale = jnp.maximum(amax, 1e-8) / 127.0
                    q8 = jnp.clip(
                        jnp.round(t_new.astype(jnp.float32) / t_scale),
                        -127, 127,
                    ).astype(jnp.int8)
                    new_cache[name] = jax.lax.dynamic_update_slice(
                        gen[name], q8, (0, 0, step, 0)
                    )
                    new_cache[name + "_scale"] = jax.lax.dynamic_update_slice(
                        gen[name + "_scale"],
                        t_scale[..., 0].astype(gen[name + "_scale"].dtype),
                        (0, 0, step),
                    )
                gen_scales = (new_cache["k_scale"], new_cache["v_scale"])
            else:
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        gen["k"], k_new.astype(gen["k"].dtype),
                        (0, 0, step, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        gen["v"], v_new.astype(gen["v"].dtype),
                        (0, 0, step, 0)),
                }
            gen_k, gen_v = new_cache["k"], new_cache["v"]
            prompt_k = decode_state["prompt"]["k"]
            prompt_v = decode_state["prompt"]["v"]
            prompt_scales = (decode_state["prompt"].get("k_scale"),
                             decode_state["prompt"].get("v_scale"))
            gen_index = decode_state.get("gen_index")
            beam_sel = None
            if gen_index is not None:
                # beam ancestry: the cache is NEVER physically reordered
                # (vs HF _reorder_cache) and never gathered either — the
                # ancestor's slot is selected inside the attention math
                # by a one-hot contraction over the row's K beams
                # (global cache row -> local beam index)
                k_beams = gen_k.shape[0] // prompt_k.shape[0]
                beam_sel = (gen_index % k_beams).astype(jnp.int32)
            out = decode_attention(
                q[:, 0],
                prompt_k,
                prompt_v,
                gen_k,
                gen_v,
                step=step + 1,
                kv_start=decode_state.get("kv_start"),
                alibi=alibi,
                beam_sel=beam_sel,
                prompt_k_scale=prompt_scales[0],
                prompt_v_scale=prompt_scales[1],
                gen_k_scale=gen_scales[0],
                gen_v_scale=gen_scales[1],
                impl=decode_state.get("attn_impl"),
            )
            return o_proj(out[:, None]), new_cache

        # ---- full / prefill
        out = multi_head_attention(
            q, k, v, mask, kv_len=kv_len, kv_start=kv_start, alibi=alibi,
        )
        # decode caches are stored heads-major [B, Hkv, S, D] — one
        # transpose at prefill, amortized over every decode step (see
        # init_gen_cache / ops.decode_attention_pallas for why)
        cache = (
            {"k": k.transpose(0, 2, 1, 3), "v": v.transpose(0, 2, 1, 3)}
            if return_cache else None
        )
        return o_proj(out), cache
