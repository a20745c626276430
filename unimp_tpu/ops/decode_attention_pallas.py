"""Fused Pallas TPU kernels for split-cache beam decode attention.

Replaces the XLA einsum path in ``ops/decode_attention.py`` on the
decode hot loop. Semantics are identical to ``decode_attention`` (see
that module and the reference behavior it replaces: HF
``_reorder_cache`` beam decode,
/root/reference/UniMP/xformers_model/llama.py:835-880):

  prompt KV [B, Hkv, T, D]    heads-major, shared across the K beams of
                              a row, masked by [kv_start, prompt_len)
  gen KV    [B, K, Hkv, G, D] heads-major, storage order (NEVER
                              physically reordered); beam k reads
                              position g of beam ``sel[b, k, g]``
  merge     one online softmax across all chunks of both segments
            (the flash-attention logsumexp identity)

Design history, with measurements (4b eval bench, v5e):

  v1  one program per (batch, head): 512 programs of ~22 tiny matmuls
      each — per-program overhead and MXU pipeline fill swamped the
      bandwidth win; 6.9 items/s vs 9.4 for the XLA einsums. Dead end:
      at single-query decode shapes the math is ISSUE-bound (K~10 query
      rows per (b, h) pair), not purely bandwidth-bound.
  v2  head-chunked grid (B, H/HB) + beams-flattened gen matmul
      ([K, P*G] in one issue instead of 2K small ones): parity with
      XLA, still reading the full G-width gen cache every step.
  v3  (this file) flash-decode: a third grid dimension walks CHUNKS of
      the KV — first the prompt in CP-wide chunks, then the gen cache
      in CG-wide chunks — with an online softmax accumulated in VMEM
      scratch. The ``step`` scalar and per-row prompt bounds are
      SCALAR-PREFETCHED so the BlockSpec index maps clamp out-of-range
      chunks to the previous block index; Pallas skips the DMA when
      consecutive block indices are equal, so HBM traffic AND compute
      scale with the VALID prefix of the cache (averaged over a decode,
      ~half the full width) — the same economy the XLA path gets from
      its dynamic chunk loop, but without round-tripping [K, T] f32
      softmax intermediates through HBM between the two matmuls.

Heads-major layout is load-bearing: Pallas blocks may only slice the
last two array dims at tile granularity, so blocking (batch, head-chunk)
slabs requires H ahead of (T, D) — and a [HB, CP, D] slab per program
is one contiguous DMA.

Ancestry without reordering: column p*CG + g of the gen-chunk logits is
ancestor p's position g, live iff ``sel[k, g] == p`` — the flat softmax
then equals a per-ancestor gather exactly (one live copy per (k, g)).

GQA: a head chunk either covers a whole number of KV-head groups
(HB*Hkv % H == 0) or stays inside one group ((H/Hkv) % HB == 0), so the
local kv index of head ``li`` is the static ``(li*Hkv)//H``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimp_tpu.ops.flash_attention import _interpret_default, _read_smem_scalar

NEG_INF = -1e30


def _pick_hb(h: int, hkv: int, block_bytes_per_head: int) -> int:
    """Largest head-chunk ≤ the target that divides H, respects GQA
    group alignment, and keeps the per-program block under ~6 MB of
    VMEM (double-buffered by the grid pipeline)."""
    target = int(os.environ.get("UNIMP_DECODE_HB", "8"))
    group = h // hkv
    hb = max(1, min(h, target))
    while hb > 1 and (
        h % hb
        or not ((hb * hkv) % h == 0 or group % hb == 0)
        or hb * block_bytes_per_head > 6 * 1024 * 1024
    ):
        hb -= 1
    return hb


def _chunk(n: int, target: int) -> int:
    """Largest divisor of n that is ≤ target AND a legal Pallas TPU
    second-minor block dim (divisible by 8, or the whole array dim).
    Falls back to n (single chunk) when no divisor qualifies."""
    for c in range(max(1, min(n, target)), 0, -1):
        if n % c == 0 and (c % 8 == 0 or c == n):
            return c
    return n


def _online_update(li, logits, mask, v2, vscale, m_ref, l_ref, o_ref,
                   in_dtype):
    """One online-softmax accumulation step for head ``li``.

    logits [K, C] f32 (masked positions already NEG_INF — a finite
    sentinel, so fully-masked chunks update with alpha == 1 and zero
    weight instead of NaN); mask [K, C] bool; v2 [C, D].
    """
    m_old = m_ref[li]  # [K]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new[:, None])
    p = jnp.where(mask, p, 0.0)
    m_ref[li] = m_new
    l_ref[li] = l_ref[li] * alpha + jnp.sum(p, axis=1)
    if vscale is not None:
        p = p * vscale
    o_c = jax.lax.dot_general(
        p.astype(in_dtype), v2.astype(in_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [K, D]
    o_ref[li] = o_ref[li] * alpha[:, None] + o_c


def _kernel(
    # scalar prefetch
    s_ref,       # SMEM [2] i32: step, max valid gen chunk
    b_ref,       # SMEM [B, 4] i32: lo, hi, first prompt chunk, last chunk
    # inputs
    q_ref,       # [1, HB, K, D]
    kp_ref,      # [1, KB, CP, D] (int8 when quantized)
    vp_ref,      # [1, KB, CP, D]
    gk_ref,      # [1, K, KB, CG, D] (int8 when quantized)
    gv_ref,      # [1, K, KB, CG, D]
    *rest,       # quantized: kps,vps [1,KB,1,CP] + gks,gvs [1,KB,1,K*CG]
                 # f32 — then sel [1,K,1,CG] i32; slopes SMEM [H] f32;
                 # out [1, HB, K, D]; scratch m,l [HB,K] f32, o [HB,K,D]
    scale: float,
    hb: int,
    h: int,
    hkv: int,
    kb: int,
    t: int,
    cp: int,
    cg: int,
    ncp: int,
    nc: int,
    has_alibi: bool,
    has_bounds: bool,
    quantized: bool,
    interp: bool,
):
    if quantized:
        (kps_ref, vps_ref, gks_ref, gvs_ref,
         sel_ref, slopes_ref, o_ref, m_ref, l_ref, oacc_ref) = rest
    else:
        sel_ref, slopes_ref, o_ref, m_ref, l_ref, oacc_ref = rest
        kps_ref = vps_ref = gks_ref = gvs_ref = None
    b_i = pl.program_id(0)
    j_i = pl.program_id(1)
    c_i = pl.program_id(2)
    # hoist every SMEM scalar read out of the pl.when bodies (the HLO
    # interpreter cannot evaluate program-id arithmetic inside them)
    step = _read_smem_scalar(s_ref, 0, interp)
    mgc = _read_smem_scalar(s_ref, 1, interp)
    lo = _read_smem_scalar(b_ref, (b_i, 0), interp)
    hi = _read_smem_scalar(b_ref, (b_i, 1), interp)
    first_pc = _read_smem_scalar(b_ref, (b_i, 2), interp)
    last_pc = _read_smem_scalar(b_ref, (b_i, 3), interp)
    slopes = None
    if has_alibi:
        slopes = [
            _read_smem_scalar(slopes_ref, j_i * hb + li, interp)
            for li in range(hb)
        ]
    q_abs = (t + step - 1).astype(jnp.float32)  # current absolute position

    @pl.when(c_i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        oacc_ref[...] = jnp.zeros_like(oacc_ref)

    # ---- prompt chunk: pc mirrors the BlockSpec index-map clamp, so
    # the mask below describes exactly the block that was DMA'd
    pc = jnp.minimum(first_pc + jnp.minimum(c_i, ncp - 1), last_pc)

    @pl.when((c_i < ncp) & (first_pc + c_i <= last_pc))
    def _prompt():
        pos = pc * cp + jax.lax.broadcasted_iota(jnp.int32, (kb, cp), 1)
        if has_bounds:
            allowed = (pos >= lo) & (pos < hi)
        else:
            allowed = jnp.ones((kb, cp), bool)
        for li in range(hb):
            ckv = (li * hkv) // h
            q = q_ref[0, li]  # [K, D]
            logits = jax.lax.dot_general(
                q, kp_ref[0, ckv].astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [K, CP]
            if quantized:
                logits = logits * kps_ref[0, ckv, 0]  # [1, CP]
            if has_alibi:
                logits = logits + slopes[li] * (pos.astype(jnp.float32)
                                                - q_abs)
            logits = jnp.where(allowed, logits, NEG_INF)
            _online_update(
                li, logits, allowed, vp_ref[0, ckv],
                vps_ref[0, ckv, 0] if quantized else None,
                m_ref, l_ref, oacc_ref, q.dtype,
            )

    # ---- gen chunk: flat (ancestor, position) softmax over the chunk
    gc = jnp.clip(c_i - ncp, 0, mgc)

    @pl.when((c_i >= ncp) & (c_i - ncp <= mgc))
    def _gen():
        sel = sel_ref[0, 0]  # [K, CG]
        pos_flat = jax.lax.broadcasted_iota(jnp.int32, (kb, kb * cg), 1)
        p_of = pos_flat // cg
        gpos = gc * cg + (pos_flat - p_of * cg)
        sel_tiled = jnp.concatenate([sel] * kb, axis=1)  # [K, P*CG]
        mask = (sel_tiled == p_of) & (gpos < step)
        for li in range(hb):
            ckv = (li * hkv) // h
            q = q_ref[0, li]
            # dequant-cast BEFORE the rank-collapsing reshape: Mosaic
            # supports the [P, CG, D] -> [P*CG, D] shape cast for bf16
            # vectors but not for packed int8 ones ("infer-vector-layout:
            # unsupported shape cast" at the 4b shapes, round-4 log)
            gk2 = gk_ref[0, :, ckv].astype(q.dtype).reshape(kb * cg, -1)
            logits = jax.lax.dot_general(
                q, gk2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [K, P*CG]
            if quantized:
                logits = logits * gks_ref[0, ckv, 0]  # [1, P*CG]
            if has_alibi:
                logits = logits + slopes[li] * ((t + gpos).astype(
                    jnp.float32) - q_abs)
            logits = jnp.where(mask, logits, NEG_INF)
            _online_update(
                li, logits, mask,
                gv_ref[0, :, ckv].astype(q.dtype).reshape(kb * cg, -1),
                gvs_ref[0, ckv, 0] if quantized else None,
                m_ref, l_ref, oacc_ref, q.dtype,
            )

    @pl.when(c_i == nc - 1)
    def _finalize():
        for li in range(hb):
            l = l_ref[li]
            denom = jnp.where(l > 0, l, 1.0)
            o_ref[0, li] = (oacc_ref[li] / denom[:, None]).astype(o_ref.dtype)


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
    """Fused flash-decode attention; returns [BK, H, D] in q.dtype.

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

    cp = _chunk(t, int(os.environ.get("UNIMP_DECODE_PCHUNK", "256")))
    cg = _chunk(g, int(os.environ.get("UNIMP_DECODE_GCHUNK", "16")))
    ncp, ncg = t // cp, g // cg
    nc = ncp + ncg
    kv_item = prompt_k.dtype.itemsize
    per_head = (2 * kb * d * q.dtype.itemsize
                + (hkv / h) * (2 * cp * d + 2 * kb * cg * d) * kv_item)
    hb = _pick_hb(h, hkv, int(per_head))
    kb_blk = max(1, (hb * hkv) // h)

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
    # [B, NCG, K, CG]: the last two block dims must equal the array dims
    # (tiny transpose; sel is [BK, G] i32)
    sel4 = sel.reshape(b, kb, ncg, cg).transpose(0, 2, 1, 3)

    step_i = jnp.asarray(step, jnp.int32)
    sinfo = jnp.stack(
        [step_i, jnp.maximum(step_i - 1, 0) // cg]).reshape(2)
    has_bounds = kv_start is not None or prompt_len is not None
    lo = (jnp.zeros((b,), jnp.int32) if kv_start is None
          else kv_start.astype(jnp.int32))
    hi = (jnp.full((b,), t, jnp.int32) if prompt_len is None
          else prompt_len.astype(jnp.int32))
    first_pc = lo // cp
    last_pc = jnp.maximum(first_pc, (jnp.maximum(hi, 1) - 1) // cp)
    binfo = jnp.stack([lo, hi, first_pc, last_pc], axis=1)  # [B, 4]
    has_alibi = alibi is not None
    slopes = (jnp.zeros((h,), jnp.float32) if alibi is None
              else alibi.astype(jnp.float32))

    # kv-chunk block index for query-head-chunk j (static arithmetic:
    # either whole groups per chunk or one shared group — see _pick_hb)
    kv_blk = lambda j: (j * hb * hkv) // (h * kb_blk)  # noqa: E731

    # chunk index maps mirror the kernel's pc/gc clamps: an out-of-range
    # chunk repeats the previous block index, and Pallas skips the DMA
    # for a repeated block — traffic follows the VALID prefix
    def pc_map(i, j, c, s_ref, b_ref):
        return jnp.minimum(
            b_ref[i, 2] + jnp.minimum(c, ncp - 1), b_ref[i, 3])

    def gc_map(i, j, c, s_ref, b_ref):
        return jnp.clip(c - ncp, 0, s_ref[1])

    in_specs = [
        pl.BlockSpec((1, hb, kb, d), lambda i, j, c, s, bb: (i, j, 0, 0)),
        pl.BlockSpec((1, kb_blk, cp, d),
                     lambda i, j, c, s, bb: (i, kv_blk(j), pc_map(i, j, c, s, bb), 0)),
        pl.BlockSpec((1, kb_blk, cp, d),
                     lambda i, j, c, s, bb: (i, kv_blk(j), pc_map(i, j, c, s, bb), 0)),
        pl.BlockSpec((1, kb, kb_blk, cg, d),
                     lambda i, j, c, s, bb: (i, 0, kv_blk(j), gc_map(i, j, c, s, bb), 0)),
        pl.BlockSpec((1, kb, kb_blk, cg, d),
                     lambda i, j, c, s, bb: (i, 0, kv_blk(j), gc_map(i, j, c, s, bb), 0)),
    ]
    inputs = [q_r, prompt_k, prompt_v, gk, gv]
    if quantized:
        # scale layouts are chosen for Pallas' last-two-dims blocking
        # (trailing singleton so the last two BLOCK dims equal the array
        # dims): prompt [B, Hkv, NCP, 1, CP]; gen [B, Hkv, NCG, 1, K*CG]
        # — the last axis matches the kernel's beams-flattened logits
        kps = prompt_k_scale.astype(jnp.float32).reshape(b, hkv, ncp, 1, cp)
        vps = prompt_v_scale.astype(jnp.float32).reshape(b, hkv, ncp, 1, cp)
        gks = gen_k_scale.astype(jnp.float32).reshape(
            b, kb, hkv, ncg, cg).transpose(0, 2, 3, 1, 4).reshape(
            b, hkv, ncg, 1, kb * cg)
        gvs = gen_v_scale.astype(jnp.float32).reshape(
            b, kb, hkv, ncg, cg).transpose(0, 2, 3, 1, 4).reshape(
            b, hkv, ncg, 1, kb * cg)
        ps_spec = pl.BlockSpec(
            (1, kb_blk, 1, 1, cp),
            lambda i, j, c, s, bb: (i, kv_blk(j), pc_map(i, j, c, s, bb),
                                    0, 0))
        gs_spec = pl.BlockSpec(
            (1, kb_blk, 1, 1, kb * cg),
            lambda i, j, c, s, bb: (i, kv_blk(j), gc_map(i, j, c, s, bb),
                                    0, 0))
        in_specs += [ps_spec, ps_spec, gs_spec, gs_spec]
        inputs += [kps, vps, gks, gvs]
    in_specs += [
        pl.BlockSpec((1, 1, kb, cg),
                     lambda i, j, c, s, bb: (i, gc_map(i, j, c, s, bb), 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # slopes
    ]
    inputs += [sel4, slopes]
    kernel = functools.partial(
        _kernel, scale=scale, hb=hb, h=h, hkv=hkv, kb=kb, t=t, cp=cp,
        cg=cg, ncp=ncp, nc=nc, has_alibi=has_alibi, has_bounds=has_bounds,
        quantized=quantized, interp=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h // hb, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, kb, d),
                               lambda i, j, c, s, bb: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, kb), jnp.float32),     # running max
            pltpu.VMEM((hb, kb), jnp.float32),     # running sum
            pltpu.VMEM((hb, kb, d), jnp.float32),  # running output
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, kb, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sinfo, binfo, *inputs)
    return out.transpose(0, 2, 1, 3).reshape(bk, h, d)


def _prompt_only_kernel(
    q_ref,   # [1, HB, K, D]
    k_ref,   # [1, KB, S, D] (int8 when quantized)
    v_ref,   # [1, KB, S, D]
    *rest,   # quantized: ks,vs [1,KB,1,S] f32 — then allowed [1,1,S] i32;
             # o [1, HB, K, D]
    scale: float,
    hb: int,
    h: int,
    hkv: int,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, allowed_ref, o_ref = rest
    else:
        allowed_ref, o_ref = rest
        ks_ref = vs_ref = None
    allowed = allowed_ref[0] != 0  # [1, S], broadcasts over K
    for li in range(hb):
        c = (li * hkv) // h
        q = q_ref[0, li]  # [K, D]
        logits = jax.lax.dot_general(
            q, k_ref[0, c].astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [K, S]
        if quantized:
            logits = logits * ks_ref[0, c]  # [1, S] per-position K scales
        logits = jnp.where(allowed, logits, NEG_INF)
        m = jnp.max(logits, axis=1)
        p = jnp.exp(logits - m[:, None])
        p = jnp.where(allowed, p, 0.0)
        l = jnp.sum(p, axis=1)
        if quantized:
            p = p * vs_ref[0, c]  # fold V scales into the softmax weights
        o = jax.lax.dot_general(
            p.astype(q.dtype), v_ref[0, c].astype(q.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, D]
        denom = jnp.where(l > 0, l, 1.0)  # all-masked row (no media) -> 0s
        o_ref[0, li] = (o / denom[:, None]).astype(o_ref.dtype)


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
    Head-chunked like the split-cache kernel (HB heads per program); the
    latents are always fully valid, so no chunk walk is needed.
    Returns [BK, H, D] in q.dtype."""
    if interpret is None:
        interpret = _interpret_default()
    bk, h, d = q.shape
    b, hkv, s = k.shape[:3]
    kb = bk // b
    if scale is None:
        scale = 1.0 / (d**0.5)
    quantized = k_scale is not None
    kv_item = k.dtype.itemsize
    per_head = (2 * kb * d * q.dtype.itemsize
                + (hkv / h) * 2 * s * d * kv_item)
    hb = _pick_hb(h, hkv, int(per_head))
    kb_blk = max(1, (hb * hkv) // h)
    q_r = q.reshape(b, kb, h, d).transpose(0, 2, 1, 3)  # [B, H, K, D]
    # [B, 1, S]: block (1, 1, s) keeps the second-minor dim equal to the
    # array dim (a (1, s) 2-D block would violate the TPU tiling rule
    # for batches not divisible by 8)
    allowed = mask.astype(jnp.int32).reshape(b, 1, s)
    kv_blk = lambda j: (j * hb * hkv) // (h * kb_blk)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, hb, kb, d), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, kb_blk, s, d), lambda i, j: (i, kv_blk(j), 0, 0)),
        pl.BlockSpec((1, kb_blk, s, d), lambda i, j: (i, kv_blk(j), 0, 0)),
    ]
    inputs = [q_r, k, v]
    if quantized:
        ks = k_scale.astype(jnp.float32).reshape(b, hkv, 1, s)
        vs = v_scale.astype(jnp.float32).reshape(b, hkv, 1, s)
        s_spec = pl.BlockSpec(
            (1, kb_blk, 1, s), lambda i, j: (i, kv_blk(j), 0, 0))
        in_specs += [s_spec, s_spec]
        inputs += [ks, vs]
    in_specs.append(pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)))
    inputs.append(allowed)
    out = pl.pallas_call(
        functools.partial(_prompt_only_kernel, scale=scale, hb=hb, h=h,
                          hkv=hkv, quantized=quantized),
        grid=(b, h // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, kb, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, kb, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    return out.transpose(0, 2, 1, 3).reshape(bk, h, d)
