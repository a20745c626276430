"""AOT TPU lowering of the fused decode kernels — no chip required.

Interpret mode (the rest of the CPU suite) checks math but NOT Mosaic's
TPU tiling/layout constraints; those surface when the kernel is lowered
for the TPU target. ``jax.export`` runs that lowering on the CPU host,
so a BlockSpec that would fail on hardware (e.g. a (1, N) block whose
second-minor dim is neither 8-divisible nor equal to the array dim —
the round-3 mask-spec bug) fails HERE instead of in the driver's bench
run. Shapes cover the real variants: d=80 (4b), d=64 (small/debug),
d=128 (3b-mpt/9b), odd batch, odd gen width, GQA, ALiBi, int8 scales.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export

from unimp_tpu.ops.decode_attention_pallas import (
    pallas_decode_attention,
    pallas_single_query_attention,
)


def _rand_cases(b, kb, t, g, h, hkv, d, dtype):
    bk = b * kb
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    q = jax.random.normal(ks[0], (bk, h, d), dtype)
    pk = jax.random.normal(ks[1], (b, hkv, t, d), dtype)
    pv = jax.random.normal(ks[2], (b, hkv, t, d), dtype)
    gk = jax.random.normal(ks[3], (bk, hkv, g, d), dtype)
    gv = jax.random.normal(ks[4], (bk, hkv, g, d), dtype)
    kv_start = jax.random.randint(ks[5], (b,), 0, t // 4)
    sel = jax.random.randint(ks[6], (bk, g), 0, kb)
    return q, pk, pv, gk, gv, kv_start, sel


@pytest.mark.parametrize(
    "b,kb,t,g,h,hkv,d,alibi",
    [
        (2, 10, 64, 50, 4, 4, 80, False),   # 4b head_dim, odd gen width
        (2, 3, 32, 24, 4, 2, 128, True),    # GQA + ALiBi (3b-mpt family)
        (3, 1, 16, 8, 2, 2, 64, False),     # greedy, odd batch
    ],
)
def test_split_cache_kernel_lowers_for_tpu(b, kb, t, g, h, hkv, d, alibi):
    q, pk, pv, gk, gv, kv_start, sel = _rand_cases(
        b, kb, t, g, h, hkv, d, jnp.bfloat16)
    slopes = (jnp.linspace(0.1, 1.0, h, dtype=jnp.float32)
              if alibi else None)

    f = jax.jit(lambda s: pallas_decode_attention(
        q, pk, pv, gk, gv, step=s, kv_start=kv_start,
        beam_sel=sel if kb > 1 else None, alibi=slopes, interpret=False))
    exp = export.export(f, platforms=["tpu"])(jnp.int32(g))
    assert len(exp.mlir_module_serialized) > 0


def test_split_cache_kernel_int8_lowers_for_tpu():
    from unimp_tpu.decode.sampler import quantize_kv_cache

    b, kb, t, g, h, d = 2, 10, 64, 50, 4, 80
    q, pk, pv, gk, gv, kv_start, sel = _rand_cases(
        b, kb, t, g, h, h, d, jnp.float32)
    prompt = quantize_kv_cache({"k": pk, "v": pv})
    gen = quantize_kv_cache({"k": gk, "v": gv})

    f = jax.jit(lambda s: pallas_decode_attention(
        q.astype(jnp.bfloat16), prompt["k"], prompt["v"],
        gen["k"], gen["v"], step=s, kv_start=kv_start, beam_sel=sel,
        prompt_k_scale=prompt["k_scale"], prompt_v_scale=prompt["v_scale"],
        gen_k_scale=gen["k_scale"], gen_v_scale=gen["v_scale"],
        interpret=False))
    exp = export.export(f, platforms=["tpu"])(jnp.int32(g))
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.parametrize("b,kb,s,h,hkv,d,int8", [
    (3, 10, 24, 4, 4, 80, False),  # odd batch — the round-3 mask-spec bug
    (2, 1, 64, 4, 2, 64, True),    # GQA + int8 latents
])
def test_prompt_only_kernel_lowers_for_tpu(b, kb, s, h, hkv, d, int8):
    bk = b * kb
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (bk, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.bfloat16)
    mask = jax.random.bernoulli(ks[3], 0.7, (b, s))
    kw = {}
    if int8:
        from unimp_tpu.decode.sampler import quantize_kv_cache

        kv = quantize_kv_cache({"k": k.astype(jnp.float32),
                                "v": v.astype(jnp.float32)})
        k, v = kv["k"], kv["v"]
        kw = dict(k_scale=kv["k_scale"], v_scale=kv["v_scale"])

    f = jax.jit(lambda m: pallas_single_query_attention(
        q, k, v, m, interpret=False, **kw))
    exp = export.export(f, platforms=["tpu"])(mask)
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.parametrize("m,k,n", [
    (160, 2560, 4096),   # 4b decode rows (B*K=160) x an MLP block
    (1, 2560, 1024),     # greedy single row
    (8, 100, 70),        # pad path at TPU tiling
])
def test_quant_matmul_lowers_for_tpu(m, k, n):
    from unimp_tpu.ops.quant_matmul import quant_matmul

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    q = jax.random.randint(ks[1], (k, n), -127, 128, jnp.int8)
    s = jax.random.uniform(ks[2], (n,), jnp.float32)

    f = jax.jit(lambda x: quant_matmul(x, q, s, interpret=False))
    exp = export.export(f, platforms=["tpu"])(x)
    assert len(exp.mlir_module_serialized) > 0


def test_full_beam_generate_lowers_for_tpu(monkeypatch):
    """Integration: the whole jitted beam-search program (prefill +
    while-loop decode + both fused kernels via the model's decode path)
    lowers for the TPU target — what bench.py/eval actually run."""
    import numpy as np

    from unimp_tpu.decode import GenerationConfig, Generator
    from unimp_tpu.models import UniMPModel, get_config

    monkeypatch.setenv("UNIMP_DECODE_IMPL", "pallas")
    cfg = get_config("debug", dtype="bfloat16")
    model = UniMPModel(cfg)
    rng = np.random.default_rng(0)
    b, t = 3, 16  # odd batch on purpose
    ids = jnp.asarray(rng.integers(10, 1000, size=(b, t)), jnp.int32)
    seq_len = jnp.asarray([t, t - 3, t - 1], jnp.int32)
    abstract = jax.eval_shape(
        lambda r: model.init(r, ids[:1])["params"], jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), abstract)

    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=7, eos_id=2, pad_id=0,
                         num_beams=3, num_return_sequences=3),
        media_id=7,
    )
    f = jax.jit(lambda p, i, s, r: gen._generate(p, i, s, None, r))
    exp = export.export(f, platforms=["tpu"])(
        params, ids, seq_len, jax.random.PRNGKey(0))
    assert len(exp.mlir_module_serialized) > 0
