"""Weight-streaming int8 matmul (ops/quant_matmul.py) + the model
layers routed through it.

Why these exist: ``QuantizedKernel.__jax_array__`` dequant is
loop-invariant inside the decode while-loop, so XLA hoists a full bf16
weight copy and int8 storage saves no per-step HBM stream. quant_dot
routes decode-row-count matmuls through a Pallas kernel that streams
the int8 bytes (the TPU-native analogue of the reference's
bitsandbytes ``load_in_8bit`` path,
/root/reference/UniMP/pipeline/serve/model_worker.py:86-142).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.ops.quant_matmul import quant_dot, quant_matmul
from unimp_tpu.utils.quant import (
    QuantizedKernel,
    concat_kernels_int8,
    quantize_params_int8,
)


def _rand_qk(rng, k, n, dtype=jnp.bfloat16):
    w = rng.standard_normal((k, n)).astype(np.float32)
    return w, quantize_params_int8(
        {"kernel": jnp.asarray(w)}, min_size=1, dtype=dtype)["kernel"]


@pytest.mark.parametrize(
    "m,k,n,bn,bk",
    [
        (12, 128, 256, None, None),      # single block
        (20, 384, 512, 128, 128),        # multi-block grid
        (4, 100, 70, 32, 48),            # pad path (non-divisible)
        (1, 256, 512, 128, 64),          # single row (greedy decode)
    ],
)
def test_quant_matmul_matches_dequant(m, k, n, bn, bk):
    rng = np.random.default_rng(0)
    w, qk = _rand_qk(rng, k, n)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

    got = quant_matmul(x, qk.q, qk.scale.reshape(-1), block_n=bn, block_k=bk)
    want = x @ qk.astype(jnp.bfloat16)  # __jax_array__ dequant path
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.25, rtol=0.05)


def test_quant_matmul_leading_batch_dims():
    rng = np.random.default_rng(1)
    w, qk = _rand_qk(rng, 64, 96)
    x = jnp.asarray(rng.standard_normal((2, 3, 64)), jnp.bfloat16)
    got = quant_matmul(x, qk.q, qk.scale.reshape(-1))
    assert got.shape == (2, 3, 96)
    want = x.reshape(-1, 64) @ qk.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(-1, 96),
        np.asarray(want, np.float32), atol=0.25, rtol=0.05)


def test_quant_dot_dispatch():
    """QuantizedKernel at decode rows -> streaming kernel; above
    max_rows or plain arrays -> XLA matmul. All three agree."""
    rng = np.random.default_rng(2)
    w, qk = _rand_qk(rng, 128, 64)
    x_small = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
    x_big = jnp.asarray(rng.standard_normal((2048, 128)), jnp.bfloat16)

    deq = qk.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(quant_dot(x_small, qk), np.float32),
        np.asarray(x_small @ deq, np.float32), atol=0.25, rtol=0.05)
    # prefill/training row counts: falls back to the XLA dequant-dot
    np.testing.assert_allclose(
        np.asarray(quant_dot(x_big, qk), np.float32),
        np.asarray(x_big @ deq, np.float32), atol=0.25, rtol=0.05)
    # plain arrays pass straight through
    wj = jnp.asarray(w)
    np.testing.assert_allclose(
        np.asarray(quant_dot(x_small, wj), np.float32),
        np.asarray(x_small @ wj.astype(jnp.bfloat16), np.float32),
        atol=0.25, rtol=0.05)


def test_quant_dot_gradient_through_frozen_kernel():
    """Frozen-int8 training differentiates THROUGH the streaming matmul
    (activations carry gradient; q/scale are weight-only-quant
    constants): custom-VJP dx must match the dequant matmul's."""
    rng = np.random.default_rng(6)
    w, qk = _rand_qk(rng, 64, 96, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)

    def loss_q(x):
        return jnp.sum(quant_dot(x, qk) ** 2)

    def loss_ref(x):
        return jnp.sum((x @ qk.astype(jnp.float32)) ** 2)

    gq = jax.grad(loss_q)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gr),
                               atol=1e-2, rtol=1e-2)


def test_concat_kernels_int8_no_dequant():
    """Fused-QKV/gate-up concat keeps int8 payloads; matmul through the
    concat matches the per-kernel dequant matmuls."""
    rng = np.random.default_rng(3)
    w1, q1 = _rand_qk(rng, 96, 32)
    w2, q2 = _rand_qk(rng, 96, 48)
    fused = concat_kernels_int8([q1, q2])
    assert isinstance(fused, QuantizedKernel)
    assert fused.q.dtype == jnp.int8 and fused.q.shape == (96, 80)
    x = jnp.asarray(rng.standard_normal((4, 96)), jnp.bfloat16)
    got = quant_dot(x, fused)
    want = jnp.concatenate(
        [x @ q1.astype(jnp.bfloat16), x @ q2.astype(jnp.bfloat16)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.25, rtol=0.05)


def test_oproj_matches_dense_general():
    """OProj == nn.DenseGeneral(axis=(-2,-1)): identical param tree
    (checkpoint compatibility) and identical forward given the same
    params."""
    from unimp_tpu.models.layers import OProj

    h, d, out = 4, 32, 96
    ref = nn.DenseGeneral(out, axis=(-2, -1), use_bias=True,
                          dtype=jnp.bfloat16, param_dtype=jnp.float32)
    ours = OProj(out, use_bias=True, dtype=jnp.bfloat16)
    y = jnp.asarray(np.random.default_rng(4).standard_normal((2, 5, h, d)),
                    jnp.bfloat16)
    p_ref = ref.init(jax.random.PRNGKey(0), y)["params"]
    p_ours = ours.init(jax.random.PRNGKey(0), y)["params"]
    assert jax.tree.map(lambda a: (a.shape, a.dtype), p_ref) == \
        jax.tree.map(lambda a: (a.shape, a.dtype), p_ours)
    # same init distribution: lecun_normal over flattened fan-in h*d
    assert np.isclose(np.asarray(p_ours["kernel"]).std(),
                      (1.0 / (h * d)) ** 0.5, rtol=0.2)
    got = ours.apply({"params": p_ref}, y)
    want = ref.apply({"params": p_ref}, y)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_oproj_quantized_scale_shape_and_parity():
    """o_proj kernels [H, d, out] contract both leading axes, so the
    per-channel scale must be [out] (n_in_axes=2) — a scale varying
    along a contracted axis could not fold out of the matmul."""
    from unimp_tpu.models.layers import OProj

    h, d, out = 4, 32, 96
    rng = np.random.default_rng(5)
    ours = OProj(out, use_bias=False, dtype=jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((6, h, d)), jnp.bfloat16)
    params = ours.init(jax.random.PRNGKey(0), y)["params"]
    qp = quantize_params_int8({"o_proj": params}, min_size=1)["o_proj"]
    qk = qp["kernel"]
    assert isinstance(qk, QuantizedKernel)
    assert qk.scale.shape == (out,)
    got = ours.apply({"params": qp}, y)
    want = ours.apply({"params": params}, y)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.3, rtol=0.1)
