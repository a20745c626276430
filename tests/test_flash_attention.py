"""Pallas flash attention vs XLA reference: forward + gradients.

The Pallas kernels run in interpreter mode on CPU; equality with the XLA
reference here implies correctness of the kernel math (tiling, online
softmax, masking) independent of the TPU lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.ops.attention_ref import AttnMask, attention_xla
from unimp_tpu.ops.flash_attention import flash_attention


def _rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def _make_qkv(b=2, sq=160, skv=192, h=4, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        _rand(ks[0], b, sq, h, d),
        _rand(ks[1], b, skv, h, d),
        _rand(ks[2], b, skv, h, d),
    )


def test_bidirectional_matches_ref():
    q, k, v = _make_qkv()
    out = flash_attention(q, k, v, interpret=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_causal_matches_ref():
    q, k, v = _make_qkv(sq=192, skv=192)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = attention_xla(q, k, v, AttnMask(causal=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_kv_len_padding_matches_ref():
    b = 3
    q, k, v = _make_qkv(b=b, sq=128, skv=256)
    kv_len = jnp.array([256, 100, 17], jnp.int32)
    out = flash_attention(q, k, v, causal=True, kv_len=kv_len, interpret=True)
    kv_valid = jnp.arange(256)[None, :] < kv_len[:, None]
    ref = attention_xla(q, k, v, AttnMask(causal=True, kv_valid=kv_valid))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode", ["immediate", "all_previous"])
def test_media_mask_matches_ref(mode):
    # Cross-attention: 2 media of 64 latents each; text tokens interleaved.
    b, sq, h, d = 2, 130, 4, 64
    n_media, n_lat = 2, 64
    skv = n_media * n_lat
    q, k, v = _make_qkv(b=b, sq=sq, skv=skv)
    # text: first 60 tokens see media 1, rest see media 2; batch row 1 has
    # a prefix before any media (media id 0).
    q_media = jnp.stack(
        [
            jnp.where(jnp.arange(sq) < 60, 1, 2),
            jnp.where(jnp.arange(sq) < 10, 0, jnp.where(jnp.arange(sq) < 90, 1, 2)),
        ]
    ).astype(jnp.int32)
    kv_media = jnp.broadcast_to(
        jnp.repeat(jnp.arange(1, n_media + 1), n_lat)[None, :], (b, skv)
    ).astype(jnp.int32)
    out = flash_attention(
        q, k, v, q_media=q_media, kv_media=kv_media, media_mode=mode,
        interpret=True,
    )
    ref = attention_xla(
        q, k, v, AttnMask(q_media=q_media, kv_media=kv_media, media_mode=mode)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fully_masked_rows_are_zero():
    # q_media=0 with "immediate" → no kv allowed → output must be 0.
    b, sq, h, d = 1, 128, 2, 64
    q, k, v = _make_qkv(b=b, sq=sq, skv=128, h=h)
    q_media = jnp.zeros((b, sq), jnp.int32)
    kv_media = jnp.ones((b, 128), jnp.int32)
    out = flash_attention(
        q, k, v, q_media=q_media, kv_media=kv_media, media_mode="immediate",
        interpret=True,
    )
    np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-6)


def test_gqa_expansion():
    b, sq, h, d = 2, 128, 8, 64
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sq, 2, d)
    v = _rand(ks[2], b, sq, 2, d)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = attention_xla(q, k, v, AttnMask(causal=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(causal=False),
        dict(causal=True),
    ],
)
def test_gradients_match_ref(kwargs):
    q, k, v = _make_qkv(b=1, sq=128, skv=128, h=2)
    kv_len = jnp.array([77], jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_len=kv_len, interpret=True, **kwargs)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        kv_valid = jnp.arange(128)[None, :] < kv_len[:, None]
        o = attention_xla(q, k, v, AttnMask(kv_valid=kv_valid, **kwargs))
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b_, atol=3e-4, rtol=3e-4)


def test_media_gradients_match_ref():
    b, sq = 1, 128
    n_lat = 64
    q, k, v = _make_qkv(b=b, sq=sq, skv=2 * n_lat, h=2)
    q_media = jnp.where(jnp.arange(sq) < 50, 1, 2)[None, :].astype(jnp.int32)
    kv_media = jnp.repeat(jnp.arange(1, 3), n_lat)[None, :].astype(jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, q_media=q_media, kv_media=kv_media,
            media_mode="immediate", interpret=True,
        )
        return jnp.sum(jnp.tanh(o))

    def loss_ref(q, k, v):
        o = attention_xla(
            q, k, v,
            AttnMask(q_media=q_media, kv_media=kv_media, media_mode="immediate"),
        )
        return jnp.sum(jnp.tanh(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b_, atol=3e-4, rtol=3e-4)


@pytest.mark.slow
def test_alibi_matches_ref():
    from unimp_tpu.ops.attention_ref import alibi_slopes

    b, sq, h, d = 2, 192, 6, 64
    q, k, v = _make_qkv(b=b, sq=sq, skv=sq, h=h, seed=7)
    slopes = alibi_slopes(h)
    out = flash_attention(
        q, k, v, causal=True, alibi_slopes=slopes, interpret=True
    )
    ref = attention_xla(q, k, v, AttnMask(causal=True), alibi=slopes)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, alibi_slopes=slopes, interpret=True)
        return jnp.sum(jnp.tanh(o))

    def loss_ref(q, k, v):
        o = attention_xla(q, k, v, AttnMask(causal=True), alibi=slopes)
        return jnp.sum(jnp.tanh(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b_, atol=3e-4, rtol=3e-4)


def test_kv_start_window_matches_ref():
    """Left-padded decode window [start, end) masking."""
    b = 2
    q, k, v = _make_qkv(b=b, sq=128, skv=256, seed=11)
    kv_start = jnp.array([0, 64], jnp.int32)
    kv_len = jnp.array([200, 256], jnp.int32)
    out = flash_attention(
        q, k, v, kv_len=kv_len, kv_start=kv_start, interpret=True
    )
    iota = jnp.arange(256)[None, :]
    kv_valid = (iota < kv_len[:, None]) & (iota >= kv_start[:, None])
    ref = attention_xla(q, k, v, AttnMask(kv_valid=kv_valid))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
