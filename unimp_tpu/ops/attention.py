"""Attention dispatch: Pallas flash kernel on TPU, XLA reference elsewhere.

One entry point, ``multi_head_attention``, used by every model module
(decoder self-attn, ViT, perceiver, gated cross-attn). Semantics are
defined by :class:`unimp_tpu.ops.attention_ref.AttnMask` and verified by
tests/test_flash_attention.py against the XLA reference.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from unimp_tpu.ops.attention_ref import AttnMask, attention_xla
from unimp_tpu.ops.flash_attention import flash_attention

# Force a backend: "pallas" | "xla" | "" (auto).
_ENV_IMPL = "UNIMP_ATTN_IMPL"

# Auto-dispatch threshold: below this KV length XLA's fused attention is
# as fast and avoids kernel-launch/tiling overhead (measured on v5e:
# ~10% train-throughput edge at seq 128); at/above it the Pallas flash
# kernel wins on memory traffic and enables long sequences.
_PALLAS_MIN_KV = int(os.environ.get("UNIMP_PALLAS_MIN_KV", "512"))


def _resolve_impl(impl: Optional[str], skv: int) -> str:
    if impl in ("pallas", "xla"):
        return impl
    env = os.environ.get(_ENV_IMPL, "")
    if env in ("pallas", "xla"):
        return env
    # Off-TPU the Pallas kernel would run interpreted — always XLA.
    if jax.default_backend() != "tpu":
        return "xla"
    return "pallas" if skv >= _PALLAS_MIN_KV else "xla"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[AttnMask] = None,
    *,
    kv_len: Optional[jax.Array] = None,
    kv_start: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Scaled-dot-product attention over [B, S, H, D] tensors.

    ``mask.kv_valid`` is only supported by the XLA path; the Pallas path
    expresses right-padding via ``kv_len`` (contiguous valid prefix) which
    is what the collator produces. Callers with right-padded batches
    should pass ``kv_len``; ``mask.kv_valid`` exists for the reference
    implementation and for tests.
    """
    mask = mask or AttnMask()
    # Sequence-parallel routing: with an active context, causal
    # self-attention (same q/kv length, no media masks, no ALiBi, no
    # left-alignment window) runs as ring attention over the mesh —
    # UNLESS the caller pinned a backend (impl= or UNIMP_ATTN_IMPL),
    # the documented parity/debug escape hatch.
    from unimp_tpu.parallel.seq_shard import get_sequence_sharding

    ctx = get_sequence_sharding()
    pinned = impl is not None or os.environ.get(_ENV_IMPL)
    if (
        not pinned
        and ctx is not None
        and mask.causal
        and mask.q_media is None
        and mask.kv_valid is None
        and alibi is None
        and kv_start is None
        and q.shape[1] == k.shape[1]
        and q.shape[2] == k.shape[2]  # no GQA in the ring path (yet)
        and q.shape[1] > 1
    ):
        from unimp_tpu.ops.ring_attention import ring_attention_sharded

        return ring_attention_sharded(
            q, k, v, ctx.mesh, seq_axis=ctx.seq_axis,
            batch_axis=ctx.batch_axis, causal=True, kv_len=kv_len,
            scale=scale,
        )

    impl = _resolve_impl(impl, k.shape[1])
    if impl == "xla":
        if (kv_len is not None or kv_start is not None) and mask.kv_valid is None:
            skv = k.shape[1]
            iota = jax.lax.broadcasted_iota(
                jax.numpy.int32, (q.shape[0], skv), 1
            )
            kv_valid = None
            if kv_len is not None:
                kv_valid = iota < kv_len[:, None]
            if kv_start is not None:
                lo = iota >= kv_start[:, None]
                kv_valid = lo if kv_valid is None else (kv_valid & lo)
            mask = AttnMask(
                causal=mask.causal,
                q_media=mask.q_media,
                kv_media=mask.kv_media,
                media_mode=mask.media_mode,
                kv_valid=kv_valid,
            )
        return attention_xla(q, k, v, mask, scale=scale, alibi=alibi)

    if mask.kv_valid is not None:
        raise NotImplementedError(
            "Pallas path expresses padding via kv_len, not kv_valid"
        )
    return flash_attention(
        q,
        k,
        v,
        causal=mask.causal,
        kv_len=kv_len,
        kv_start=kv_start,
        q_media=mask.q_media,
        kv_media=mask.kv_media,
        media_mode=mask.media_mode,
        alibi_slopes=alibi,
        scale=scale,
    )
