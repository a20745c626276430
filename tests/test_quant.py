"""Weight-only int8 quantization: numerics + full-model decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.utils.quant import (
    QuantizedKernel,
    count_quantized,
    quantize_params_int8,
    quantized_bytes,
)

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane


def test_dequant_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 256)).astype(np.float32)
    qk = quantize_params_int8({"kernel": jnp.asarray(w)}, min_size=1)["kernel"]
    assert isinstance(qk, QuantizedKernel)
    assert qk.q.dtype == jnp.int8 and qk.shape == w.shape
    deq = np.asarray(qk.astype(jnp.float32))
    # per-channel absmax rounding: |err| <= scale/2 per element
    scale = np.abs(w).max(axis=0) / 127.0
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)


def test_non_kernel_leaves_pass_through():
    tree = {
        "norm": {"scale": jnp.ones((64,))},
        "bias": jnp.zeros((64,)),
        "embed": {"embedding": jnp.ones((512, 64))},
        "proj": {"kernel": jnp.ones((512, 64))},
        "tiny": {"kernel": jnp.ones((4, 4))},  # below min_size
    }
    out = quantize_params_int8(tree, min_size=1 << 10)
    assert count_quantized(out) == 1
    assert isinstance(out["proj"]["kernel"], QuantizedKernel)
    assert not isinstance(out["embed"]["embedding"], QuantizedKernel)
    assert not isinstance(out["tiny"]["kernel"], QuantizedKernel)
    assert quantized_bytes(out) < quantized_bytes(tree)


def test_matmul_and_concat_through_jit():
    """The flax access patterns: kernel.astype(x.dtype) @, jnp.concatenate."""
    rng = np.random.default_rng(1)
    w1 = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    q1 = quantize_params_int8({"kernel": w1}, min_size=1)["kernel"]
    q2 = quantize_params_int8({"kernel": w2}, min_size=1)["kernel"]

    @jax.jit
    def f(x, q1, q2):
        fused = jnp.concatenate([q1, q2], axis=1)  # __jax_array__ path
        return x.astype(jnp.bfloat16) @ fused.astype(jnp.bfloat16)

    got = np.asarray(f(x, q1, q2), np.float32)
    want = np.asarray(x @ jnp.concatenate([w1, w2], axis=1), np.float32)
    assert np.allclose(got, want, atol=0.5, rtol=0.1)


@pytest.fixture(scope="module")
def small_model():
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config

    cfg = get_config("debug", dtype="float32")
    model = UniMPModel(cfg)
    rng = np.random.default_rng(2)
    b, s, media_id = 2, 48, 7
    ids = rng.integers(10, cfg.lm.vocab_size, size=(b, s)).astype(np.int32)
    ids[:, 1] = media_id
    img = cfg.vision.image_size
    images = rng.standard_normal((b, 1, img, img, 3)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), vision_x=jnp.asarray(images),
        q_media=compute_q_media(jnp.asarray(ids), media_id),
    )["params"]
    return model, params, ids, images, media_id


def test_model_forward_close_and_decode_runs(small_model):
    from unimp_tpu.decode import GenerationConfig, Generator
    from unimp_tpu.models import compute_q_media

    model, params, ids, images, media_id = small_model
    qparams = quantize_params_int8(params, min_size=1 << 10)
    assert count_quantized(qparams) > 10

    def fwd(p):
        logits, _ = model.apply(
            {"params": p}, jnp.asarray(ids), vision_x=jnp.asarray(images),
            q_media=compute_q_media(jnp.asarray(ids), media_id),
        )
        return np.asarray(logits, np.float32)

    ref, got = fwd(params), fwd(qparams)
    # int8 weights: logits drift but rankings survive — top-1 agreement
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree
    assert np.abs(ref - got).max() < np.abs(ref).max() * 0.2

    # full beam decode path (prefill + decode caches) under quantized params
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=4, eos_id=2, pad_id=2, num_beams=2,
                         num_return_sequences=2),
        media_id=media_id,
    )
    latents = model.apply(
        {"params": qparams}, jnp.asarray(images),
        method=type(model).encode_vision,
    )
    seq_len = jnp.full((ids.shape[0],), ids.shape[1], jnp.int32)
    tokens, _ = gen.generate(qparams, jnp.asarray(ids), seq_len, latents)
    assert np.asarray(tokens).shape[0] == ids.shape[0]


@pytest.mark.parametrize("num_beams", [1, 3])
def test_kv_int8_decode_matches_fp(small_model, num_beams):
    """kv_int8=True (int8 prompt/latent/gen KV caches) keeps beam and
    greedy decode outputs aligned with the full-precision cache path."""
    from unimp_tpu.decode import GenerationConfig, Generator

    model, params, ids, images, media_id = small_model
    latents = model.apply(
        {"params": params}, jnp.asarray(images),
        method=type(model).encode_vision,
    )
    seq_len = jnp.full((ids.shape[0],), ids.shape[1], jnp.int32)

    def run(kv_int8):
        gen = Generator(
            model,
            GenerationConfig(max_new_tokens=6, eos_id=2, pad_id=2,
                             num_beams=num_beams,
                             num_return_sequences=num_beams,
                             kv_int8=kv_int8),
            media_id=media_id,
        )
        tokens, scores = gen.generate(
            params, jnp.asarray(ids), seq_len, latents
        )
        return np.asarray(tokens), np.asarray(scores)

    t_fp, s_fp = run(False)
    t_q8, s_q8 = run(True)
    assert t_q8.shape == t_fp.shape
    # int8 cache noise may flip rare near-ties; the vast majority of
    # tokens must agree and scores must stay close
    agree = (t_fp == t_q8).mean()
    assert agree >= 0.8, agree
    assert np.allclose(s_fp, s_q8, atol=0.1, rtol=0.1)
