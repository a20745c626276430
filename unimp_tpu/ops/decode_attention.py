"""Split-cache decode attention (single-query, two KV segments).

The decode-path bottleneck in beam search is HBM traffic: a naive
[B*K, max_len] KV cache (a) duplicates the prompt KV K times and (b)
must be physically reordered by beam index every step (HF
`_reorder_cache`, /root/reference/UniMP/xformers_model/llama.py:871).
With a 400-token prompt and 50 generated tokens, ~90% of that traffic is
redundant.

This op splits the cache:

  prompt KV  [B, T]        — shared by all K beams of a row, written once
                             at prefill, NEVER reordered or duplicated
  gen KV     [B*K, G]      — only the generated tokens (G = max_new),
                             reordered per step (tiny)

and computes single-query attention as two partial attentions merged by
their logsumexps (the flash-attention combine identity).

Caches are heads-major: prompt [B, Hkv, T, D], gen [BK, Hkv, G, D] —
the layout the fused Pallas kernel requires (it blocks (batch,
head-chunk) slabs per grid step and Pallas can only slice the last two
array dims; see ops/decode_attention_pallas.py).

Dispatch note (measured on v5e, 4b eval bench): the DEFAULT impl is the
XLA einsum path below — at single-query decode shapes the math is
MXU-issue-bound (K~10 query rows per (batch, head) pair), so the Pallas
kernel's VMEM-resident softmax did not beat XLA's batched einsums
end-to-end (6.9 vs 9.4 items/s for the per-(b,h)-program v1; parity for
the head-chunked v2). The kernel remains available via
impl="pallas" / UNIMP_DECODE_IMPL=pallas ("xla" pins the einsum path).

ALiBi biases use consistent absolute positions across both segments so
the merge weights are exact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _expand_kv(k, v, h):
    hkv = k.shape[1]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    return k, v


def _beam_segment_attn(q, k, v, mask, scale, bias=None):
    """q [B, K, H, D]; k,v [B, H, S, D]; mask [B, S]; bias [B?|1, H, S].

    Returns (out [B, K, H, D] f32 UNnormalized, m [B, K, H], l [B, K, H]).
    """
    logits = jnp.einsum(
        "bkhd,bhsd->bkhs", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias[:, None, :, :]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum(
        "bkhs,bhsd->bkhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out, m, l


def _chunked_gen_segment(q_r, gk, gv, sel, step, scale, alibi, t, q_abs,
                         chunk):
    """Gen-segment attention reading only the VALID chunks of the cache.

    The static-shape alternative streams the full [*, G] gen cache every
    step even when only ``step`` columns hold tokens — at G=50 that is
    ~2x the necessary HBM traffic averaged over a decode, and profiling
    the 4b decode step showed the gen-KV stream dominating
    (benchmarks/decode_profile.py: attention 20.6 ms of a 33.5 ms step).
    This loop runs ceil(step/chunk) iterations (dynamic trip count -> XLA
    while_loop) and merges chunks by streaming logsumexp, the same
    flash-attention identity the prompt/gen merge already uses.

    q_r [B, K, H, D]; gk/gv [B, P, H, G, D]; sel [B, K, G] local ancestor
    beam per column (all-zeros with P=1 covers the no-beam layout).
    Returns (out [B,K,H,D] f32 UNnormalized, m [B,K,H], l [B,K,H]).
    """
    b, kb, h, d = q_r.shape
    p_ = gk.shape[1]
    g = gk.shape[3]
    n_chunks = (step + chunk - 1) // chunk
    m0 = jnp.full((b, kb, h), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, kb, h), jnp.float32)
    o0 = jnp.zeros((b, kb, h, d), jnp.float32)

    def body(ci, carry):
        m, l, o = carry
        # clamp so the final (partial) chunk re-reads the tail; the
        # pos >= ci*chunk guard keeps overlapped columns from double
        # counting
        start = jnp.minimum(ci * chunk, g - chunk)
        ks = jax.lax.dynamic_slice_in_dim(gk, start, chunk, axis=3)
        vs = jax.lax.dynamic_slice_in_dim(gv, start, chunk, axis=3)
        sc = jax.lax.dynamic_slice_in_dim(sel, start, chunk, axis=2)
        pos = start + jnp.arange(chunk, dtype=jnp.int32)  # [C] actual cols
        valid = (pos >= ci * chunk) & (pos < step)
        logits_all = jnp.einsum(
            "bkhd,bphcd->bkpch", q_r, ks, preferred_element_type=jnp.float32
        ) * scale
        onehot = (
            sc[:, :, None, :]
            == jnp.arange(p_, dtype=sc.dtype)[None, None, :, None]
        )  # [B, K, P, C]
        logits = jnp.sum(
            jnp.where(onehot[..., None], logits_all, 0.0), axis=2
        )  # [B, K, C, H]
        if alibi is not None:
            ki = (t + pos).astype(jnp.float32)
            bias = alibi[None, :] * (ki[:, None] - q_abs)  # [C, H]
            logits = logits + bias[None, None]
        mask4 = valid[None, None, :, None]
        logits = jnp.where(mask4, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=2))
        p = jnp.exp(logits - m_new[:, :, None, :])
        p = jnp.where(mask4, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=2)
        p_sel = p[:, :, None] * onehot[..., None]  # [B, K, P, C, H]
        o_c = jnp.einsum(
            "bkpch,bphcd->bkhd", p_sel.astype(vs.dtype), vs,
            preferred_element_type=jnp.float32,
        )
        o = o * alpha[..., None] + o_c
        return m_new, l, o

    m, l, o = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, o0))
    return o, m, l


def single_query_attention(
    q: jax.Array,  # [BK, H, D]
    k: jax.Array,  # [B, Hkv, S, D] (shared across the K beams of a row)
    v: jax.Array,
    mask: jax.Array,  # [B, S] bool, True = allowed
    scale: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # [B, Hkv, S]: int8 latent KV
    v_scale: Optional[jax.Array] = None,
    impl: Optional[str] = None,  # None=auto ("pallas" on TPU), "xla"
) -> jax.Array:
    """Single-segment single-query attention with beam-shared KV.

    Used for decode-time gated cross-attention: the projected media
    latents are identical for all beams of a batch row, so the KV is
    read once per row rather than once per beam. On TPU this runs the
    fused prompt-only Pallas kernel (softmax stays in VMEM); pin with
    impl=/UNIMP_DECODE_IMPL. int8 latents: pass raw int8 + k/v_scale.
    """
    if (k_scale is None) != (v_scale is None):
        raise ValueError("int8 latent KV requires both k_scale and v_scale")
    if impl is None:
        impl = os.environ.get("UNIMP_DECODE_IMPL", "auto")
    if impl == "auto":
        impl = "xla"  # measured: see the module docstring's dispatch note
    if impl == "pallas":
        from unimp_tpu.ops.decode_attention_pallas import (
            pallas_single_query_attention,
        )

        return pallas_single_query_attention(
            q, k, v, mask, scale=scale, k_scale=k_scale, v_scale=v_scale)
    bk, h, d = q.shape
    b, _, s = k.shape[:3]
    if k_scale is not None:  # XLA impl: dequantize, fused downstream
        k = k.astype(q.dtype) * k_scale[..., None].astype(q.dtype)
        v = v.astype(q.dtype) * v_scale[..., None].astype(q.dtype)
    k, v = _expand_kv(k, v, h)
    if scale is None:
        scale = 1.0 / (d**0.5)
    q_r = q.reshape(b, bk // b, h, d)
    out, m, l = _beam_segment_attn(q_r, k, v, mask, scale)
    denom = jnp.where(l > 0, l, 1.0)
    out = (out / denom[..., None]).reshape(bk, h, d)
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,  # [BK, H, D] current-step queries (RoPE already applied)
    prompt_k: jax.Array,  # [B, Hkv, T, D]
    prompt_v: jax.Array,
    gen_k: jax.Array,  # [BK, Hkv, G, D] (this step's k/v already written)
    gen_v: jax.Array,
    *,
    step: jax.Array,  # scalar: tokens generated so far INCLUDING current
    kv_start: Optional[jax.Array] = None,  # [B] left-pad offsets
    prompt_len: Optional[jax.Array] = None,  # [B] valid prompt length (<=T)
    alibi: Optional[jax.Array] = None,  # [H] slopes
    scale: Optional[float] = None,
    beam_sel: Optional[jax.Array] = None,  # [BK, G] local ancestor beam
    prompt_k_scale: Optional[jax.Array] = None,  # [B, Hkv, T]: int8 caches
    prompt_v_scale: Optional[jax.Array] = None,
    gen_k_scale: Optional[jax.Array] = None,     # [BK, Hkv, G]
    gen_v_scale: Optional[jax.Array] = None,
    gen_chunk: Optional[int] = None,  # None=auto, 0=full-width read
    impl: Optional[str] = None,  # None=auto ("pallas" on TPU), "xla"
) -> jax.Array:
    """Returns [BK, H, D] attention outputs in q.dtype.

    beam_sel implements the ancestry table WITHOUT a gather: the gen
    cache stays in storage order and beam k attends to position g of
    beam ``beam_sel[bk, g]`` via a one-hot contraction over the K beams
    of its row. A take_along_axis gather here materializes (and
    randomly addresses) the whole [BK, G] cache per layer per step —
    measured ~10x slower than the contiguous reads + K-fold einsum at
    K=10 (the extra FLOPs are noise next to the HBM stream).

    int8 caches: pass the raw int8 arrays plus the four ``*_scale``
    trees — the Pallas impl dequantizes in VMEM (the int8 bytes are the
    whole HBM stream); the XLA impl dequantizes here, fused by XLA into
    the contractions.
    """
    bk, h, d = q.shape
    b, _, t = prompt_k.shape[:3]
    g = gen_k.shape[2]
    k_beams = bk // b
    n_scales = sum(s is not None for s in (prompt_k_scale, prompt_v_scale,
                                           gen_k_scale, gen_v_scale))
    if n_scales not in (0, 4):
        raise ValueError(
            "int8 decode caches require all four *_scale arrays (prompt "
            f"and gen, K and V) or none; got {n_scales}/4"
        )
    if impl is None:
        impl = os.environ.get("UNIMP_DECODE_IMPL", "auto")
    if impl == "auto":
        impl = "xla"  # measured: see the module docstring's dispatch note
    if impl == "pallas":
        from unimp_tpu.ops.decode_attention_pallas import (
            pallas_decode_attention,
        )

        return pallas_decode_attention(
            q, prompt_k, prompt_v, gen_k, gen_v, step=step,
            kv_start=kv_start, prompt_len=prompt_len, alibi=alibi,
            scale=scale, beam_sel=beam_sel,
            prompt_k_scale=prompt_k_scale, prompt_v_scale=prompt_v_scale,
            gen_k_scale=gen_k_scale, gen_v_scale=gen_v_scale,
        )
    if prompt_k_scale is not None:  # XLA impl: dequantize up front
        cd = q.dtype
        prompt_k = prompt_k.astype(cd) * prompt_k_scale[..., None].astype(cd)
        prompt_v = prompt_v.astype(cd) * prompt_v_scale[..., None].astype(cd)
        gen_k = gen_k.astype(cd) * gen_k_scale[..., None].astype(cd)
        gen_v = gen_v.astype(cd) * gen_v_scale[..., None].astype(cd)
    prompt_k, prompt_v = _expand_kv(prompt_k, prompt_v, h)
    gen_k, gen_v = _expand_kv(gen_k, gen_v, h)
    if scale is None:
        scale = 1.0 / (d**0.5)
    q_abs = t + step - 1  # absolute position of the current token

    # ---- prompt segment: KV shared across beams
    pos_p = jnp.arange(t, dtype=jnp.int32)[None, :]  # [1, T]
    mask_p = jnp.ones((b, t), bool)
    if kv_start is not None:
        mask_p &= pos_p >= kv_start[:, None]
    if prompt_len is not None:
        mask_p &= pos_p < prompt_len[:, None]
    bias_p = None
    if alibi is not None:
        ki = pos_p.astype(jnp.float32)  # [1, T]
        bias_p = alibi[None, :, None] * (ki[:, None, :] - q_abs)  # [1, H, T]
    q_r = q.reshape(b, k_beams, h, d)
    out_p, m_p, l_p = _beam_segment_attn(q_r, prompt_k, prompt_v, mask_p,
                                         scale, bias_p)

    # ---- generated segment
    if gen_chunk is None:
        # auto: FULL-WIDTH read for ordinary gen widths. Inside the real
        # decode while_loop `step` is traced, so the chunked walk's trip
        # count is dynamic — a nested while_loop per layer per step whose
        # scalar-sync overhead measured ~20 ms/step at 4b high fill
        # (loop25 vs loop50 A/B: 20.5 -> 41.2 ms/step net while
        # attention's true fill slope is ~0.18 ms/fill; with full-width
        # reads the step is fill-flat). The bytes the chunked walk saves
        # only beat that overhead for wide caches, so chunk only when
        # G is large. UNIMP_DECODE_GEN_CHUNK=<n> forces chunk n; =0
        # forces full-width.
        env = os.environ.get("UNIMP_DECODE_GEN_CHUNK")
        if env is not None:
            # explicit pin: honored verbatim (clamped to g below) — only
            # the auto heuristic downgrades narrow caches to full-width
            gen_chunk = int(env)
        else:
            gen_chunk = 16 if g > 128 else 0
            if gen_chunk and g < 2 * gen_chunk:
                gen_chunk = 0
    if gen_chunk:
        gen_chunk = min(gen_chunk, g)
        if beam_sel is not None:
            gk5 = gen_k.reshape(b, k_beams, h, g, d)
            gv5 = gen_v.reshape(b, k_beams, h, g, d)
            sel = beam_sel.reshape(b, k_beams, g)
            out_g, m_g, l_g = _chunked_gen_segment(
                q_r, gk5, gv5, sel, step, scale, alibi, t, q_abs, gen_chunk
            )
        else:
            gk5 = gen_k[:, None]  # [BK, 1, H, G, D]
            gv5 = gen_v[:, None]
            sel = jnp.zeros((bk, 1, g), jnp.int32)
            out_f, m_f, l_f = _chunked_gen_segment(
                q[:, None], gk5, gv5, sel, step, scale, alibi, t, q_abs,
                gen_chunk,
            )
            out_g = out_f.reshape(b, k_beams, h, d)
            m_g = m_f.reshape(b, k_beams, h)
            l_g = l_f.reshape(b, k_beams, h)
        m = jnp.maximum(m_p, m_g)
        a_p = jnp.exp(m_p - m)
        a_g = jnp.exp(m_g - m)
        l = l_p * a_p + l_g * a_g
        denom = jnp.where(l > 0, l, 1.0)
        out = (out_p * a_p[..., None] + out_g * a_g[..., None]) / denom[..., None]
        return out.reshape(bk, h, d).astype(q.dtype)

    pos_g = jnp.arange(g, dtype=jnp.int32)[None, :]
    bias_g = None
    if alibi is not None:
        ki_g = (t + pos_g).astype(jnp.float32)
        bias_g = alibi[None, :, None] * (ki_g[:, None, :] - q_abs)  # [1,H,G]
    if beam_sel is None:
        # per-beam KV, [BK] folded as batch (greedy / pre-reordered)
        mask_g = jnp.broadcast_to(pos_g < step, (bk, g))
        out_g, m_g, l_g = _beam_segment_attn(
            q[:, None], gen_k, gen_v, mask_g, scale, bias_g
        )
        out_g = out_g.reshape(b, k_beams, h, d)
        m_g = m_g.reshape(b, k_beams, h)
        l_g = l_g.reshape(b, k_beams, h)
    else:
        # ancestry via one-hot contraction over the row's K beams
        gk = gen_k.reshape(b, k_beams, h, g, d)
        gv = gen_v.reshape(b, k_beams, h, g, d)
        logits_all = jnp.einsum(
            "bkhd,bphgd->bkpgh", q_r, gk, preferred_element_type=jnp.float32
        ) * scale  # [B, K, P(ancestor beam), G, H]
        sel = beam_sel.reshape(b, k_beams, g)
        onehot = (
            sel[:, :, None, :]
            == jnp.arange(k_beams, dtype=sel.dtype)[None, None, :, None]
        )  # [B, K, P, G]
        logits = jnp.sum(
            jnp.where(onehot[..., None], logits_all, 0.0), axis=2
        )  # [B, K, G, H]
        if bias_g is not None:
            logits = logits + bias_g.transpose(0, 2, 1)[:, None]  # [1,G,H]
        mask_bg = (pos_g < step)[None, :, :, None]  # [1, 1, G, 1]
        logits = jnp.where(mask_bg, logits, NEG_INF)
        m_g = jnp.max(logits, axis=2)  # [B, K, H]
        p = jnp.exp(logits - m_g[:, :, None, :])
        p = jnp.where(mask_bg, p, 0.0)
        l_g = jnp.sum(p, axis=2)  # [B, K, H]
        p_sel = p[:, :, None] * onehot[..., None]  # [B, K, P, G, H]
        out_g = jnp.einsum(
            "bkpgh,bphgd->bkhd", p_sel.astype(gv.dtype), gv,
            preferred_element_type=jnp.float32,
        )

    # ---- merge the two segments by logsumexp
    m = jnp.maximum(m_p, m_g)
    a_p = jnp.exp(m_p - m)
    a_g = jnp.exp(m_g - m)
    l = l_p * a_p + l_g * a_g
    denom = jnp.where(l > 0, l, 1.0)
    out = (out_p * a_p[..., None] + out_g * a_g[..., None]) / denom[..., None]
    return out.reshape(bk, h, d).astype(q.dtype)
