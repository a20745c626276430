"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's xformers CUDA
``memory_efficient_attention`` calls (causal decoder self-attention at
/root/reference/UniMP/xformers_model/llama.py:286-301, bidirectional ViT
attention at clip.py:130) and for open_flamingo's media-masked gated
cross-attention.

Algorithm: standard blocked online-softmax (flash attention) —
q/k/v tiled over a (batch*heads, q_blocks, kv_blocks) grid with the KV
dimension innermost; running max ``m``, normalizer ``l`` and f32
accumulator kept in VMEM scratch across KV steps. Backward recomputes
probabilities from the saved logsumexp and accumulates dk/dv (kv-major
kernel) and dq (q-major kernel) on the MXU.

Supported masking (composable, computed on the fly from indices — no
materialized [Sq, Skv] bias in HBM):
  * ``causal``       lower-triangular over absolute positions
  * ``kv_len``/``kv_start``  per-batch valid KV window [start, end)
                     (right padding; left-padded decode prompts)
  * media masking    per-position media indices; "immediate" restricts
                     text queries to latents of the most recent media,
                     "all_previous" to all preceding media (Flamingo).

Layout: public API is [B, S, H, D]; kernels run on [B*H, S, D] with the
last two dims mapped to (sublanes, lanes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_INTERPRET = None  # resolved lazily: interpret kernels off-TPU (CPU tests)


def _interpret_default() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_mask(
    q_off,
    kv_off,
    bq: int,
    bk: int,
    *,
    causal: bool,
    kv_bounds=None,
    q_media_blk=None,
    kv_media_blk=None,
    media_mode: Optional[str] = None,
):
    """[bq, bk] boolean 'allowed' mask for one tile, or None if unmasked."""
    allowed = None

    def _and(a, m):
        return m if a is None else jnp.logical_and(a, m)

    qi = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    ki = kv_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if causal:
        allowed = _and(allowed, ki <= qi)
    if kv_bounds is not None:
        lo, hi = kv_bounds
        allowed = _and(allowed, jnp.logical_and(ki >= lo, ki < hi))
    if media_mode is not None:
        qm = q_media_blk.reshape(bq, 1)
        km = kv_media_blk.reshape(1, bk)
        if media_mode == "immediate":
            allowed = _and(allowed, qm == km)
        elif media_mode == "all_previous":
            allowed = _and(allowed, jnp.logical_and(km <= qm, km > 0))
        else:
            raise ValueError(f"unknown media_mode: {media_mode}")
    return allowed


def _read_smem_scalar(ref, idx, interp: bool):
    """Scalar read from a whole-array SMEM ref at a traced index.

    On TPU, dynamic scalar indexing of an SMEM ref lowers fine; the
    pallas HLO interpreter (CPU tests) can't evaluate program_id inside
    a ref-transform, so read the whole row and take() instead.
    """
    if interp:
        flat = ref[...]
        if isinstance(idx, tuple):
            return jnp.take(flat.reshape(-1), idx[0] * flat.shape[-1] + idx[1])
        return jnp.take(flat, idx)
    return ref[idx]


def _fwd_kernel(
    *refs,
    bq: int,
    bk: int,
    scale: float,
    causal: bool,
    media_mode: Optional[str],
    has_kv_len: bool,
    has_alibi: bool,
    h: int,
    interp: bool,
):
    """One (bh, iq, ik) grid step of the forward pass."""
    i = 0
    q_ref, k_ref, v_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    kv_len_ref = None
    q_media_ref = kv_media_ref = None
    if has_kv_len:
        kv_len_ref = refs[i]
        i += 1
    slopes_ref = None
    if has_alibi:
        slopes_ref = refs[i]
        i += 1
    if media_mode is not None:
        q_media_ref, kv_media_ref = refs[i], refs[i + 1]
        i += 2
    o_ref, lse_ref = refs[i], refs[i + 1]
    acc, m_scr, l_scr = refs[i + 2], refs[i + 3], refs[i + 4]

    iq = pl.program_id(1)
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q_off = iq * bq
    kv_off = ik * bk
    # program_id is not interpretable inside pl.when bodies; read here.
    kv_len_val = None
    if has_kv_len:
        bidx = pl.program_id(0) // h
        kv_len_val = (
            _read_smem_scalar(kv_len_ref, (bidx, 0), interp),
            _read_smem_scalar(kv_len_ref, (bidx, 1), interp),
        )
    alibi_slope = (
        _read_smem_scalar(slopes_ref, pl.program_id(0) % h, interp)
        if has_alibi
        else None
    )

    def _step():
        q = q_ref[0]  # [bq, d]
        k = k_ref[0]  # [bk, d]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        if has_alibi:
            qi = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            ki = kv_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = s + alibi_slope * (ki - qi).astype(jnp.float32)
        allowed = _block_mask(
            q_off,
            kv_off,
            bq,
            bk,
            causal=causal,
            kv_bounds=kv_len_val,
            q_media_blk=q_media_ref[0] if media_mode else None,
            kv_media_blk=kv_media_ref[0] if media_mode else None,
            media_mode=media_mode,
        )
        if allowed is not None:
            s = jnp.where(allowed, s, NEG_INF)
        m_prev = m_scr[:]  # [bq, 1] column
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        if allowed is not None:
            # exp(NEG_INF - m) underflows to 0 already unless the whole row
            # is masked (m == NEG_INF); kill that case explicitly.
            p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = m_new
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # Tiles entirely above the diagonal contribute nothing.
        pl.when(kv_off <= q_off + bq - 1)(_step)
    else:
        _step()

    @pl.when(ik == n_k - 1)
    def _finish():
        l = l_scr[:]
        denom = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc[:] / denom).astype(o_ref.dtype)
        # lse for backward; fully-masked rows stay NEG_INF.
        lse_ref[0] = jnp.where(l > 0.0, m_scr[:] + jnp.log(denom), NEG_INF)


def _bwd_dkv_kernel(
    *refs,
    bq: int,
    bk: int,
    scale: float,
    causal: bool,
    media_mode: Optional[str],
    has_kv_len: bool,
    has_alibi: bool,
    h: int,
    interp: bool,
):
    """Accumulate dk, dv for one kv block, sweeping q blocks (innermost)."""
    i = 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[i : i + 6]
    i += 6
    kv_len_ref = None
    q_media_ref = kv_media_ref = None
    if has_kv_len:
        kv_len_ref = refs[i]
        i += 1
    slopes_ref = None
    if has_alibi:
        slopes_ref = refs[i]
        i += 1
    if media_mode is not None:
        q_media_ref, kv_media_ref = refs[i], refs[i + 1]
        i += 2
    dk_ref, dv_ref = refs[i], refs[i + 1]
    dk_acc, dv_acc = refs[i + 2], refs[i + 3]

    ik = pl.program_id(1)
    iq = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_off = iq * bq
    kv_off = ik * bk
    kv_len_val = None
    if has_kv_len:
        bidx = pl.program_id(0) // h
        kv_len_val = (
            _read_smem_scalar(kv_len_ref, (bidx, 0), interp),
            _read_smem_scalar(kv_len_ref, (bidx, 1), interp),
        )
    alibi_slope = (
        _read_smem_scalar(slopes_ref, pl.program_id(0) % h, interp)
        if has_alibi
        else None
    )

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]  # [bq, 1] column
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_alibi:
            qi2 = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            ki2 = kv_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = s + alibi_slope * (ki2 - qi2).astype(jnp.float32)
        allowed = _block_mask(
            q_off, kv_off, bq, bk,
            causal=causal,
            kv_bounds=kv_len_val,
            q_media_blk=q_media_ref[0] if media_mode else None,
            kv_media_blk=kv_media_ref[0] if media_mode else None,
            media_mode=media_mode,
        )
        p = jnp.exp(s - lse)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)
        # dv += p^T @ do
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ds = p * (do @ v^T - delta) * scale
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        # dk += ds^T @ q
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        pl.when(kv_off <= q_off + bq - 1)(_step)
    else:
        _step()

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    *refs,
    bq: int,
    bk: int,
    scale: float,
    causal: bool,
    media_mode: Optional[str],
    has_kv_len: bool,
    has_alibi: bool,
    h: int,
    interp: bool,
):
    """Accumulate dq for one q block, sweeping kv blocks (innermost)."""
    i = 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[i : i + 6]
    i += 6
    kv_len_ref = None
    q_media_ref = kv_media_ref = None
    if has_kv_len:
        kv_len_ref = refs[i]
        i += 1
    slopes_ref = None
    if has_alibi:
        slopes_ref = refs[i]
        i += 1
    if media_mode is not None:
        q_media_ref, kv_media_ref = refs[i], refs[i + 1]
        i += 2
    dq_ref = refs[i]
    dq_acc = refs[i + 1]

    iq = pl.program_id(1)
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_off = iq * bq
    kv_off = ik * bk
    kv_len_val = None
    if has_kv_len:
        bidx = pl.program_id(0) // h
        kv_len_val = (
            _read_smem_scalar(kv_len_ref, (bidx, 0), interp),
            _read_smem_scalar(kv_len_ref, (bidx, 1), interp),
        )
    alibi_slope = (
        _read_smem_scalar(slopes_ref, pl.program_id(0) % h, interp)
        if has_alibi
        else None
    )

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]  # [bq, 1] column
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_alibi:
            qi2 = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            ki2 = kv_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = s + alibi_slope * (ki2 - qi2).astype(jnp.float32)
        allowed = _block_mask(
            q_off, kv_off, bq, bk,
            causal=causal,
            kv_bounds=kv_len_val,
            q_media_blk=q_media_ref[0] if media_mode else None,
            kv_media_blk=kv_media_ref[0] if media_mode else None,
            media_mode=media_mode,
        )
        p = jnp.exp(s - lse)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        pl.when(kv_off <= q_off + bq - 1)(_step)
    else:
        _step()

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _qkv_specs(h, bq, bk, d, *, has_kv_len, has_alibi, media_mode, kv_major):
    """BlockSpecs for (q, k, v[, kv_len][, q_media, kv_media]).

    Arrays are [B*H, S, D] (q/k/v), [B, 1] (kv_len, SMEM), [B, S] (media).
    Grid is (b*h, outer, inner); q-major: outer=iq; kv-major: outer=ik.
    """
    if kv_major:
        iq_of = lambda bh, o, i: i  # noqa: E731
        ik_of = lambda bh, o, i: o  # noqa: E731
    else:
        iq_of = lambda bh, o, i: o  # noqa: E731
        ik_of = lambda bh, o, i: i  # noqa: E731

    q_spec = pl.BlockSpec((1, bq, d), lambda bh, o, i: (bh, iq_of(bh, o, i), 0))
    k_spec = pl.BlockSpec((1, bk, d), lambda bh, o, i: (bh, ik_of(bh, o, i), 0))
    specs = [q_spec, k_spec, k_spec]
    if has_kv_len:
        # kv bounds [B, 2] int32 (start, end), whole array in SMEM; kernels
        # index by program_id(0) // h (sub-array SMEM blocks aren't legal).
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if has_alibi:
        # alibi slopes [H] f32, whole array in SMEM, indexed by head.
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if media_mode is not None:
        # media ids are [B, 1, S]; block (1, 1, bq) keeps the trailing two
        # dims (1, bq) legal (1 == array dim, bq % 128 == 0).
        specs.append(
            pl.BlockSpec((1, 1, bq), lambda bh, o, i: (bh // h, 0, iq_of(bh, o, i)))
        )
        specs.append(
            pl.BlockSpec((1, 1, bk), lambda bh, o, i: (bh // h, 0, ik_of(bh, o, i)))
        )
    return specs, iq_of, ik_of


def _pad_seq(x, target, axis, value=0):
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _flash_attention(
    q,
    k,
    v,
    kv_len,
    q_media,
    kv_media,
    slopes,
    h: int,
    causal: bool,
    media_mode: Optional[str],
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
):
    out, _ = _flash_fwd(
        q, k, v, kv_len, q_media, kv_media, slopes, h,
        causal, media_mode, scale, block_q, block_k, interpret,
    )
    return out


def _flash_fwd(
    q, k, v, kv_len, q_media, kv_media, slopes, h,
    causal, media_mode, scale, block_q, block_k, interpret,
):
    bh, sq, d = q.shape
    skv = k.shape[1]
    has_kv_len = kv_len is not None
    has_alibi = slopes is not None
    n_q = sq // block_q
    n_k = skv // block_k
    grid = (bh, n_q, n_k)

    in_specs, _, _ = _qkv_specs(
        h, block_q, block_k, d,
        has_kv_len=has_kv_len, has_alibi=has_alibi,
        media_mode=media_mode, kv_major=False,
    )
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
    ]
    kernel = functools.partial(
        _fwd_kernel,
        bq=block_q, bk=block_k, scale=scale, causal=causal,
        media_mode=media_mode, has_kv_len=has_kv_len, has_alibi=has_alibi,
        h=h, interp=interpret,
    )
    args = [q, k, v]
    if has_kv_len:
        args.append(kv_len)
    if has_alibi:
        args.append(slopes)
    if media_mode is not None:
        args.extend([q_media, kv_media])
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out, (q, k, v, kv_len, q_media, kv_media, slopes, out, lse)


def _flash_bwd(
    h, causal, media_mode, scale, block_q, block_k, interpret, residuals, g
):
    q, k, v, kv_len, q_media, kv_media, slopes, out, lse = residuals
    bh, sq, d = q.shape
    skv = k.shape[1]
    has_kv_len = kv_len is not None
    has_alibi = slopes is not None
    n_q = sq // block_q
    n_k = skv // block_k

    do = g.astype(q.dtype)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )

    def _extra_args():
        a = []
        if has_kv_len:
            a.append(kv_len)
        if has_alibi:
            a.append(slopes)
        if media_mode is not None:
            a.extend([q_media, kv_media])
        return a

    # ---- dk, dv: kv-major grid ----
    in_specs, _, _ = _qkv_specs(
        h, block_q, block_k, d,
        has_kv_len=has_kv_len, has_alibi=has_alibi,
        media_mode=media_mode, kv_major=True,
    )
    do_spec = pl.BlockSpec((1, block_q, d), lambda b, o, i: (b, i, 0))
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, o, i: (b, i, 0))
    in_specs = in_specs[:3] + [do_spec, row_spec, row_spec] + in_specs[3:]
    kernel = functools.partial(
        _bwd_dkv_kernel,
        bq=block_q, bk=block_k, scale=scale, causal=causal,
        media_mode=media_mode, has_kv_len=has_kv_len, has_alibi=has_alibi,
        h=h, interp=interpret,
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, n_k, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, *_extra_args())

    # ---- dq: q-major grid ----
    in_specs, _, _ = _qkv_specs(
        h, block_q, block_k, d,
        has_kv_len=has_kv_len, has_alibi=has_alibi,
        media_mode=media_mode, kv_major=False,
    )
    do_spec = pl.BlockSpec((1, block_q, d), lambda b, o, i: (b, o, 0))
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, o, i: (b, o, 0))
    in_specs = in_specs[:3] + [do_spec, row_spec, row_spec] + in_specs[3:]
    kernel = functools.partial(
        _bwd_dq_kernel,
        bq=block_q, bk=block_k, scale=scale, causal=causal,
        media_mode=media_mode, has_kv_len=has_kv_len, has_alibi=has_alibi,
        h=h, interp=interpret,
    )
    dq = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, sq, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, *_extra_args())[0]

    return dq, dk, dv, None, None, None, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,
    kv_start: Optional[jax.Array] = None,
    q_media: Optional[jax.Array] = None,
    kv_media: Optional[jax.Array] = None,
    media_mode: Optional[str] = None,
    alibi_slopes: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over [B, S, H, D] tensors.

    Args:
      q: [B, Sq, H, D]; k, v: [B, Skv, Hkv, D] (Hkv == H or divides it).
      causal: lower-triangular masking over absolute positions.
      kv_len: [B] int32 — end of the valid KV window per batch row.
      kv_start: [B] int32 — start of the valid KV window (left padding).
      q_media / kv_media: [B, Sq] / [B, Skv] int32 media indices.
      media_mode: None | "immediate" | "all_previous".
      alibi_slopes: [H] f32 per-head ALiBi slopes; adds slope*(ki-qi) to
        the logits (MPT-style position encoding, no RoPE).
      scale: softmax scale (default 1/sqrt(D)).
      block_q/block_k: tile sizes, clamped to the (128-padded) sequence
        lengths. Large defaults: on v5e, q1024/k512 runs 2048-token
        fwd+bwd ~1.7x faster than 128/128 (fewer grid steps, better
        MXU occupancy); small sequences clamp down automatically.
      interpret: force pallas interpreter (defaults to True off-TPU).

    Returns [B, Sq, H, D].
    """
    if interpret is None:
        interpret = _interpret_default()
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    if hkv != h:
        assert h % hkv == 0
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    if scale is None:
        scale = 1.0 / (d**0.5)
    if (q_media is None) != (media_mode is None):
        raise ValueError("q_media/kv_media and media_mode must be set together")

    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(skv, 128))
    sq_p = _ceil_to(sq, block_q)
    skv_p = _ceil_to(skv, block_k)

    if (skv_p != skv or kv_start is not None) and kv_len is None:
        kv_len = jnp.full((b,), skv, jnp.int32)
    if kv_len is not None and kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)

    # [B, S, H, D] -> [B*H, S, D]
    qt = _pad_seq(jnp.swapaxes(q, 1, 2), sq_p, axis=2).reshape(b * h, sq_p, d)
    kt = _pad_seq(jnp.swapaxes(k, 1, 2), skv_p, axis=2).reshape(b * h, skv_p, d)
    vt = _pad_seq(jnp.swapaxes(v, 1, 2), skv_p, axis=2).reshape(b * h, skv_p, d)
    kv_len_arg = (
        None
        if kv_len is None
        else jnp.stack(
            [kv_start.reshape(b).astype(jnp.int32),
             kv_len.reshape(b).astype(jnp.int32)],
            axis=1,
        )
    )
    qm = None if q_media is None else _pad_seq(q_media.astype(jnp.int32), sq_p, 1).reshape(b, 1, sq_p)
    km = None if kv_media is None else _pad_seq(
        kv_media.astype(jnp.int32), skv_p, 1, value=np.iinfo(np.int32).max
    ).reshape(b, 1, skv_p)

    slopes = None if alibi_slopes is None else alibi_slopes.astype(jnp.float32)
    out = _flash_attention(
        qt, kt, vt, kv_len_arg, qm, km, slopes,
        h, causal, media_mode, scale, block_q, block_k, interpret,
    )
    out = out.reshape(b, h, sq_p, d)[:, :, :sq]
    return jnp.swapaxes(out, 1, 2)
