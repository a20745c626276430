"""Ring attention: sequence-parallel exact attention over the mesh.

A new TPU-native capability beyond the reference (which has no context
parallelism at all — SURVEY.md §5 long-context): the sequence axis is
sharded over a mesh axis, each device holds a Q/K/V shard, and K/V
shards rotate around the ring with `jax.lax.ppermute` while every device
accumulates online-softmax partials for its Q shard. Communication is
overlapped with compute by XLA (collective-permute + local attention per
step); memory per device is O(S/N · S/N) per step instead of O(S²).

Semantics are exact full attention (causal or bidirectional) over the
global sequence — verified against the single-device reference on an
8-device CPU mesh in tests/test_ring_attention.py.

Usage (inside shard_map or via the convenience wrapper):

    out = ring_attention(q, k, v, axis_name="sp", causal=True)

where q/k/v are the per-device [B, S/N, H, D] shards.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attn(q, k, v, scale, q_off, kv_off, causal, kv_len):
    """Local attention partials: returns (out_unnorm f32, m, l)."""
    sq, skv = q.shape[1], k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    ki = kv_off + jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
    if causal:
        qi = q_off + jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        logits = jnp.where((ki <= qi)[None, None], logits, NEG_INF)
    if kv_len is not None:
        # right-padding: only global KV positions < kv_len[b] are valid
        valid = ki[None] < kv_len[:, None, None]  # [B, Sq, Skv]
        logits = jnp.where(valid[:, None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)  # [B, H, Sq]
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(m[..., None] <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out, m, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[jax.Array] = None,
    *,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Per-device shards [B, S/N, H, D] -> attention over the global S.

    Must run inside shard_map/pmap with `axis_name` bound to the
    sequence-parallel mesh axis. Shards are assumed to be contiguous
    sequence chunks in axis order (device i holds tokens
    [i*S/N, (i+1)*S/N)). ``kv_len`` [B] bounds the valid (right-padded)
    global KV prefix, matching the flash kernel's semantics.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / (d**0.5)
    q_off = idx * sq

    def body(step, carry):
        out, m, l, kc, vc = carry
        # the K/V chunk currently held arrived from device (idx - step)
        src = (idx - step) % n
        kv_off = src * sq
        o_p, m_p, l_p = _block_attn(q, kc, vc, scale, q_off, kv_off, causal,
                                    kv_len)
        m_new = jnp.maximum(m, m_p)
        a_old = jnp.exp(m - m_new)
        a_new = jnp.exp(m_p - m_new)
        l = l * a_old + l_p * a_new
        # out is [B, Sq, H, D]; weights are [B, H, Sq] -> transpose
        w_old = jnp.transpose(a_old, (0, 2, 1))[..., None]
        w_new = jnp.transpose(a_new, (0, 2, 1))[..., None]
        out = out * w_old + o_p * w_new
        m = m_new
        # rotate K/V to the next device (ring)
        perm = [(i, (i + 1) % n) for i in range(n)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return out, m, l, kc, vc

    # derive the initial accumulators from q so shard_map marks them as
    # device-varying (plain constants trip the carry-type check)
    zero_q = q.astype(jnp.float32) * 0.0
    out0 = zero_q
    m0 = jnp.transpose(zero_q[..., 0], (0, 2, 1)) + NEG_INF  # [B, H, Sq]
    l0 = jnp.transpose(zero_q[..., 0], (0, 2, 1))
    out, m, l, _, _ = jax.lax.fori_loop(
        0, n, body, (out0, m0, l0, k, v)
    )
    denom = jnp.transpose(jnp.where(l > 0, l, 1.0), (0, 2, 1))[..., None]
    return (out / denom).astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    seq_axis: str = "fsdp",
    batch_axis: str = "dp",
    causal: bool = False,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Convenience wrapper: global [B, S, H, D] arrays -> shard_map over
    (batch_axis x seq_axis) -> global result. Composable under jit: the
    caller's activations are resharded to (batch, sequence) blocks on
    entry and back on exit by XLA."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(batch_axis, seq_axis, None, None)
    if kv_len is None:
        fn = shard_map(
            partial(ring_attention, axis_name=seq_axis, causal=causal,
                    scale=scale),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
        return fn(q, k, v)
    fn = shard_map(
        partial(ring_attention, axis_name=seq_axis, causal=causal,
                scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(batch_axis)),
        out_specs=spec,
    )
    return fn(q, k, v, kv_len)
