"""Ring attention == full attention, verified over an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.ops.attention_ref import AttnMask, attention_xla
from unimp_tpu.ops.ring_attention import ring_attention_sharded
from unimp_tpu.parallel import make_mesh


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    mesh = make_mesh(dp=2, fsdp=4, tp=1)  # sequence sharded 4-way
    b, s, h, d = 4, 256, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)

    out = ring_attention_sharded(q, k, v, mesh, causal=causal)
    ref = attention_xla(q, k, v, AttnMask(causal=causal))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients():
    mesh = make_mesh(dp=1, fsdp=8, tp=1)
    b, s, h, d = 2, 128, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(
            jnp.tanh(ring_attention_sharded(q, k, v, mesh, causal=True))
        )

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(attention_xla(q, k, v, AttnMask(causal=True))))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4)
