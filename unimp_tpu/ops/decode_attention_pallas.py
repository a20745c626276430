"""Fused Pallas TPU kernel for split-cache beam decode attention.

Replaces the XLA einsum path in ``ops/decode_attention.py`` on the
decode hot loop. Why a kernel: profiling the 4b decode step
(benchmarks/decode_profile.py) measured attention at ~16 ms of a
~34.5 ms step while its KV traffic floor is ~6 ms — the difference is
the materialized f32 softmax intermediates. XLA must round-trip the
[K, T] prompt logits and the one-hot-selected gen logits through HBM
between the two matmuls of each segment (~200 MB per layer per step at
B=16, K=10, T=256); this kernel keeps every intermediate in VMEM so the
HBM stream is the KV bytes themselves.

Semantics are identical to ``decode_attention`` (see that module and
the reference behavior it replaces: HF ``_reorder_cache`` beam decode,
/root/reference/UniMP/xformers_model/llama.py:835-880):

  prompt KV [B, Hkv, T, D]    heads-major, shared across the K beams of
                              a row, masked by [kv_start, prompt_len)
  gen KV    [B, K, Hkv, G, D] heads-major, storage order (NEVER
                              physically reordered); beam k reads
                              position g of beam ``sel[b, k, g]`` via a
                              per-ancestor where-select computed in VMEM
  merge     the two partial softmaxes combine by the flash-attention
            logsumexp identity

Heads-major layout is load-bearing: Pallas blocks may only slice the
last two array dims at tile granularity, so blocking one (batch, head)
slab per grid step requires H ahead of (T, D) — and a [T, D] slab per
(b, h) is one contiguous DMA.

Grid: (B, H), one program per (batch row, query head); each program
holds q [K, D], the (b, h) prompt slab, and the row's K gen-cache slabs
in VMEM (≲0.5 MB at 4b shapes), computes both segments and the merge,
and writes [K, D]. The per-ancestor loop is a static unroll over the
K beams — K-by-D matmuls are MXU-trivial; the win is bandwidth.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimp_tpu.ops.flash_attention import _interpret_default, _read_smem_scalar

NEG_INF = -1e30


def _kernel(
    q_ref,       # [1, 1, K, D]
    kp_ref,      # [1, 1, T, D] (int8 when quantized)
    vp_ref,      # [1, 1, T, D]
    gk_ref,      # [1, K, 1, G, D] (int8 when quantized)
    gv_ref,      # [1, K, 1, G, D]
    *rest,       # quantized: kps,vps [1,1,T] + gks,gvs [1,1,K,G] f32 —
                 # then sel [1,K,G] i32; step SMEM [1] i32;
                 # bounds SMEM [B,2] i32; slopes SMEM [H] f32; o [1,1,K,D]
    scale: float,
    kb: int,
    t: int,
    g: int,
    has_alibi: bool,
    has_bounds: bool,
    quantized: bool,
    interp: bool,
):
    if quantized:
        (kps_ref, vps_ref, gks_ref, gvs_ref,
         sel_ref, step_ref, bounds_ref, slopes_ref, o_ref) = rest
    else:
        sel_ref, step_ref, bounds_ref, slopes_ref, o_ref = rest
        kps_ref = vps_ref = gks_ref = gvs_ref = None
    b_i = pl.program_id(0)
    h_i = pl.program_id(1)
    step = _read_smem_scalar(step_ref, 0, interp)
    slope = None
    if has_alibi:
        slope = _read_smem_scalar(slopes_ref, h_i, interp)
    q = q_ref[0, 0]  # [K, D]
    in_dtype = q.dtype
    q_abs = (t + step - 1).astype(jnp.float32)  # current absolute position

    # ---- prompt segment: shared KV, [K, T] logits stay in VMEM
    # int8 caches dequantize in VMEM: the per-(head, position) scale
    # folds into the [K, T] logits (for K) and the softmax weights
    # (for V) — the HBM stream is the int8 bytes, nothing else
    kp = kp_ref[0, 0]  # [T, D]
    logits_p = jax.lax.dot_general(
        q, kp.astype(in_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [K, T]
    if quantized:
        logits_p = logits_p * kps_ref[0]  # [1, T] broadcast
    pos_p = jax.lax.broadcasted_iota(jnp.int32, (kb, t), 1)
    if has_alibi:
        logits_p = logits_p + slope * (pos_p.astype(jnp.float32) - q_abs)
    allowed = None
    if has_bounds:
        lo = _read_smem_scalar(bounds_ref, (b_i, 0), interp)
        hi = _read_smem_scalar(bounds_ref, (b_i, 1), interp)
        allowed = (pos_p >= lo) & (pos_p < hi)
        logits_p = jnp.where(allowed, logits_p, NEG_INF)
    m_p = jnp.max(logits_p, axis=1)  # [K]
    p_p = jnp.exp(logits_p - m_p[:, None])
    if allowed is not None:
        p_p = jnp.where(allowed, p_p, 0.0)
    l_p = jnp.sum(p_p, axis=1)
    pw_p = p_p * vps_ref[0] if quantized else p_p  # fold V scale [1, T]
    o_p = jax.lax.dot_general(
        pw_p.astype(in_dtype), vp_ref[0, 0].astype(in_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, D]

    # ---- gen segment: ancestry resolved by where-select per ancestor
    sel = sel_ref[0]  # [K, G]
    gks = gks_ref[0, 0] if quantized else None  # [K, G]
    gvs = gvs_ref[0, 0] if quantized else None
    pos_g = jax.lax.broadcasted_iota(jnp.int32, (kb, g), 1)
    valid_g = pos_g < step
    logits_g = jnp.zeros((kb, g), jnp.float32)
    for p_beam in range(kb):
        lg = jax.lax.dot_general(
            q, gk_ref[0, p_beam, 0].astype(in_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [K, G]
        if quantized:
            lg = lg * gks[p_beam:p_beam + 1]  # ancestor's scales [1, G]
        logits_g = jnp.where(sel == p_beam, lg, logits_g)
    if has_alibi:
        ki_g = (t + pos_g).astype(jnp.float32)
        logits_g = logits_g + slope * (ki_g - q_abs)
    logits_g = jnp.where(valid_g, logits_g, NEG_INF)
    m_g = jnp.max(logits_g, axis=1)
    p_g = jnp.exp(logits_g - m_g[:, None])
    p_g = jnp.where(valid_g, p_g, 0.0)
    l_g = jnp.sum(p_g, axis=1)
    o_g = jnp.zeros_like(o_p)
    for p_beam in range(kb):
        pw = jnp.where(sel == p_beam, p_g, 0.0)
        if quantized:
            pw = pw * gvs[p_beam:p_beam + 1]
        o_g = o_g + jax.lax.dot_general(
            pw.astype(in_dtype), gv_ref[0, p_beam, 0].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    # ---- merge by logsumexp
    m = jnp.maximum(m_p, m_g)
    a_p = jnp.exp(m_p - m)
    a_g = jnp.exp(m_g - m)
    l = l_p * a_p + l_g * a_g
    denom = jnp.where(l > 0, l, 1.0)
    out = (o_p * a_p[:, None] + o_g * a_g[:, None]) / denom[:, None]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def pallas_decode_attention(
    q: jax.Array,         # [BK, H, D] current-step queries (RoPE applied)
    prompt_k: jax.Array,  # [B, Hkv, T, D] heads-major prompt cache
    prompt_v: jax.Array,
    gen_k: jax.Array,     # [BK, Hkv, G, D] heads-major gen cache
    gen_v: jax.Array,
    *,
    step: jax.Array,      # scalar: tokens generated so far INCL. current
    kv_start: Optional[jax.Array] = None,    # [B] left-pad offsets
    prompt_len: Optional[jax.Array] = None,  # [B] valid prompt length
    alibi: Optional[jax.Array] = None,       # [H] slopes
    scale: Optional[float] = None,
    beam_sel: Optional[jax.Array] = None,    # [BK, G] local ancestor beam
    prompt_k_scale: Optional[jax.Array] = None,  # [B, Hkv, T] int8 dequant
    prompt_v_scale: Optional[jax.Array] = None,
    gen_k_scale: Optional[jax.Array] = None,     # [BK, Hkv, G]
    gen_v_scale: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused decode attention; returns [BK, H, D] in q.dtype.

    When the four ``*_scale`` arrays are given, the KV caches are int8
    and dequantize inside the kernel: K scales fold into the logits, V
    scales into the softmax weights — the HBM stream is the int8 bytes,
    no dequantized copy ever materializes (the reason the XLA int8 path
    measured slower than bf16, benchmarks/records/eval_4b_int8_v5e.json).
    """
    if interpret is None:
        interpret = _interpret_default()
    bk, h, d = q.shape
    b, hkv, t = prompt_k.shape[:3]
    g = gen_k.shape[2]
    kb = bk // b
    if scale is None:
        scale = 1.0 / (d**0.5)
    quantized = prompt_k_scale is not None
    if quantized:
        assert (prompt_v_scale is not None and gen_k_scale is not None
                and gen_v_scale is not None), "all four KV scales required"

    q_r = q.reshape(b, kb, h, d).transpose(0, 2, 1, 3)  # [B, H, K, D]
    gk = gen_k.reshape(b, kb, hkv, g, d)
    gv = gen_v.reshape(b, kb, hkv, g, d)
    if beam_sel is None:
        # each beam reads only its own row (greedy / pre-reordered)
        sel = jnp.broadcast_to(
            jnp.arange(kb, dtype=jnp.int32)[None, :, None], (b, kb, g)
        )
    else:
        sel = beam_sel.reshape(b, kb, g).astype(jnp.int32)

    step_arr = jnp.asarray(step, jnp.int32).reshape(1)
    has_bounds = kv_start is not None or prompt_len is not None
    if has_bounds:
        lo = (jnp.zeros((b,), jnp.int32) if kv_start is None
              else kv_start.astype(jnp.int32))
        hi = (jnp.full((b,), t, jnp.int32) if prompt_len is None
              else prompt_len.astype(jnp.int32))
        bounds = jnp.stack([lo, hi], axis=1)  # [B, 2]
    else:
        bounds = jnp.zeros((b, 2), jnp.int32)
    has_alibi = alibi is not None
    slopes = (jnp.zeros((h,), jnp.float32) if alibi is None
              else alibi.astype(jnp.float32))

    kv_head = lambda b_i, h_i: (h_i * hkv) // h  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, kb, d), lambda i, j: (i, j, 0, 0)),        # q
        pl.BlockSpec((1, 1, t, d), lambda i, j: (i, kv_head(i, j), 0, 0)),
        pl.BlockSpec((1, 1, t, d), lambda i, j: (i, kv_head(i, j), 0, 0)),
        pl.BlockSpec((1, kb, 1, g, d),
                     lambda i, j: (i, 0, kv_head(i, j), 0, 0)),        # gk
        pl.BlockSpec((1, kb, 1, g, d),
                     lambda i, j: (i, 0, kv_head(i, j), 0, 0)),        # gv
    ]
    inputs = [q_r, prompt_k, prompt_v, gk, gv]
    if quantized:
        # scale layouts are chosen for Pallas' last-two-dims blocking:
        # prompt [B*Hkv, 1, T] (block (1,1,T) — second-minor dim 1 equals
        # the array dim), gen [B, Hkv, K, G] (block (1,1,K,G) full dims)
        kps = prompt_k_scale.astype(jnp.float32).reshape(b * hkv, 1, t)
        vps = prompt_v_scale.astype(jnp.float32).reshape(b * hkv, 1, t)
        gks = gen_k_scale.astype(jnp.float32).reshape(
            b, kb, hkv, g).transpose(0, 2, 1, 3)
        gvs = gen_v_scale.astype(jnp.float32).reshape(
            b, kb, hkv, g).transpose(0, 2, 1, 3)
        ps_spec = pl.BlockSpec(
            (1, 1, t), lambda i, j: (i * hkv + kv_head(i, j), 0, 0))
        gs_spec = pl.BlockSpec(
            (1, 1, kb, g), lambda i, j: (i, kv_head(i, j), 0, 0))
        in_specs += [ps_spec, ps_spec, gs_spec, gs_spec]
        inputs += [kps, vps, gks, gvs]
    in_specs += [
        pl.BlockSpec((1, kb, g), lambda i, j: (i, 0, 0)),              # sel
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # step
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # bounds
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # slopes
    ]
    inputs += [sel, step_arr, bounds, slopes]
    kernel = functools.partial(
        _kernel, scale=scale, kb=kb, t=t, g=g,
        has_alibi=has_alibi, has_bounds=has_bounds, quantized=quantized,
        interp=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, kb, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, kb, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.transpose(0, 2, 1, 3).reshape(bk, h, d)


def _prompt_only_kernel(
    q_ref,   # [1, 1, K, D]
    k_ref,   # [1, 1, S, D] (int8 when quantized)
    v_ref,   # [1, 1, S, D]
    *rest,   # quantized: ks,vs [1,1,S] f32 — then allowed [1,S] i32;
             # o [1,1,K,D]
    scale: float,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, allowed_ref, o_ref = rest
    else:
        allowed_ref, o_ref = rest
        ks_ref = vs_ref = None
    q = q_ref[0, 0]  # [K, D]
    logits = jax.lax.dot_general(
        q, k_ref[0, 0].astype(q.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [K, S]
    if quantized:
        logits = logits * ks_ref[0]  # [1, S] per-position K scales
    allowed = allowed_ref[0] != 0  # [1, S], broadcasts over K
    logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.max(logits, axis=1)
    p = jnp.exp(logits - m[:, None])
    p = jnp.where(allowed, p, 0.0)
    l = jnp.sum(p, axis=1)
    if quantized:
        p = p * vs_ref[0]  # fold V scales into the softmax weights
    o = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0, 0].astype(q.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, D]
    denom = jnp.where(l > 0, l, 1.0)  # all-masked row (no media) -> zeros
    o_ref[0, 0] = (o / denom[:, None]).astype(o_ref.dtype)


def pallas_single_query_attention(
    q: jax.Array,     # [BK, H, D] current-step queries
    k: jax.Array,     # [B, Hkv, S, D] heads-major, shared across K beams
    v: jax.Array,
    mask: jax.Array,  # [B, S] bool, True = allowed
    *,
    scale: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # [B, Hkv, S]: int8 latent KV
    v_scale: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused single-segment decode attention (gated cross-attention path:
    the projected media latents are the whole KV; no gen cache). Same
    VMEM-resident softmax argument as the split-cache kernel above —
    the HBM stream is the latent KV bytes, not the [K, S] f32
    intermediates. int8 latents dequantize in VMEM via k_scale/v_scale.
    Returns [BK, H, D] in q.dtype."""
    if interpret is None:
        interpret = _interpret_default()
    bk, h, d = q.shape
    b, hkv, s = k.shape[:3]
    kb = bk // b
    if scale is None:
        scale = 1.0 / (d**0.5)
    quantized = k_scale is not None
    q_r = q.reshape(b, kb, h, d).transpose(0, 2, 1, 3)  # [B, H, K, D]
    # [B, 1, S]: block (1, 1, s) keeps the second-minor dim equal to the
    # array dim (a (1, s) 2-D block would violate the TPU tiling rule
    # for batches not divisible by 8)
    allowed = mask.astype(jnp.int32).reshape(b, 1, s)
    kv_head = lambda b_i, h_i: (h_i * hkv) // h  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, kb, d), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, s, d), lambda i, j: (i, kv_head(i, j), 0, 0)),
        pl.BlockSpec((1, 1, s, d), lambda i, j: (i, kv_head(i, j), 0, 0)),
    ]
    inputs = [q_r, k, v]
    if quantized:
        ks = k_scale.astype(jnp.float32).reshape(b * hkv, 1, s)
        vs = v_scale.astype(jnp.float32).reshape(b * hkv, 1, s)
        s_spec = pl.BlockSpec(
            (1, 1, s), lambda i, j: (i * hkv + kv_head(i, j), 0, 0))
        in_specs += [s_spec, s_spec]
        inputs += [ks, vs]
    in_specs.append(pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)))
    inputs.append(allowed)
    out = pl.pallas_call(
        functools.partial(_prompt_only_kernel, scale=scale,
                          quantized=quantized),
        grid=(b, h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, kb, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, kb, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.transpose(0, 2, 1, 3).reshape(bk, h, d)
