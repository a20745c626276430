"""Ring attention == full attention, verified over an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.ops.attention_ref import AttnMask, attention_xla
from unimp_tpu.ops.ring_attention import ring_attention_sharded
from unimp_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane


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


def test_model_forward_backward_seq_sharded():
    """UniMPModel trains with ring (sequence-parallel) attention: with
    sequence_sharding active, forward logits and parameter gradients
    match the unsharded model on an 8-device (dp=2, fsdp=4) mesh."""
    import numpy as np

    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.parallel import make_mesh, sequence_sharding

    mesh = make_mesh(dp=2, fsdp=4, tp=1)
    cfg = get_config("debug", dtype="float32")
    model = UniMPModel(cfg)
    media_id = 7
    rng = np.random.default_rng(0)
    B, T = 4, 32
    ids = rng.integers(10, 100, size=(B, T)).astype(np.int32)
    ids[:, 0] = media_id
    ids = jnp.asarray(ids)
    kv_len = jnp.asarray([T, 20, T, 28], jnp.int32)
    vision = jnp.asarray(rng.normal(size=(B, 1, 28, 28, 3)), jnp.float32)
    q_media = compute_q_media(ids, media_id)
    params = model.init(jax.random.PRNGKey(0), ids, vision_x=vision,
                        q_media=q_media)["params"]

    def loss_fn(p):
        logits, _ = model.apply({"params": p}, ids, vision_x=vision,
                                q_media=q_media, kv_len=kv_len)
        return jnp.mean(logits**2)

    base_loss, base_grads = jax.value_and_grad(loss_fn)(params)
    with sequence_sharding(mesh, seq_axis="fsdp", batch_axis="dp"):
        ring_loss, ring_grads = jax.jit(jax.value_and_grad(loss_fn))(params)

    np.testing.assert_allclose(float(ring_loss), float(base_loss),
                               rtol=2e-5, atol=2e-6)
    flat_a = jax.tree_util.tree_leaves(base_grads)
    flat_b = jax.tree_util.tree_leaves(ring_grads)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_ring_attention_kv_len():
    """kv_len right-padding in the ring matches the XLA reference."""
    import numpy as np

    from unimp_tpu.ops.attention_ref import AttnMask, attention_xla
    from unimp_tpu.ops.ring_attention import ring_attention_sharded
    from unimp_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, fsdp=4, tp=1)
    rng = np.random.default_rng(1)
    B, S, H, D = 4, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    kv_len = jnp.asarray([32, 9, 17, 25], jnp.int32)

    got = ring_attention_sharded(q, k, v, mesh, seq_axis="fsdp",
                                 batch_axis="dp", causal=True, kv_len=kv_len)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    ref = attention_xla(q, k, v, AttnMask(causal=True,
                                          kv_valid=iota < kv_len[:, None]))
    # rows past kv_len are all-masked garbage in either impl; compare
    # only valid query rows
    for b in range(B):
        n = int(kv_len[b])
        np.testing.assert_allclose(np.asarray(got)[b, :n],
                                   np.asarray(ref)[b, :n],
                                   rtol=2e-5, atol=2e-5)
