"""Mesh-sharded decode: sharding stability across program boundaries.

Round-2 review finding: the multichip dryrun tail carried
``[SPMD] Involuntary full rematerialization`` warnings — the partitioner
was handed conflicting layouts for decode-state/ring tensors and fell
back to replicate-then-repartition at program boundaries. Two guarantees
are locked here:

1. decode-state shardings ROUND-TRIP: a jitted single-token decode step
   returns gen-KV caches with exactly the shardings they came in with
   (rows pinned on the (dp, fsdp) data axes by Generator._rows), so a
   while-loop decode never reshards its carry.
2. the full mesh eval path (sharded prefill -> batched beam decode) and
   the jitted ring-attention forward emit ZERO involuntary-
   rematerialization warnings (subprocess stderr capture — the warning
   is printed by the XLA C++ partitioner, not raised in Python).
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.parallel import make_mesh
from unimp_tpu.parallel.sharding import batch_sharding, param_sharding

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane


def _debug_model(vocab=1024):
    import dataclasses

    from unimp_tpu.models import UniMPModel, get_config

    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=vocab))
    return cfg, UniMPModel(cfg)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_state_sharding_roundtrip(quantized):
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg, model = _debug_model()
    b, t, max_new = 8, 16, 4
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, 1000, size=(b, t)), jnp.int32)

    bshard = batch_sharding(mesh)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    params = jax.device_put(params, param_sharding(params, mesh))
    ids = jax.device_put(np.asarray(ids), bshard)

    # prefill: prompt KV born with batch-row sharding
    _, kv = jax.jit(
        lambda p, i: model.apply(
            {"params": p}, i, return_kv=True, last_logit_only=True
        )
    )(params, ids)

    from unimp_tpu.decode import GenerationConfig, Generator

    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=max_new, eos_id=2, pad_id=2),
        media_id=7,
        mesh=mesh,
    )
    self_kv = kv["self"]
    if quantized:  # int8 caches + scale trees shard like their floats
        from unimp_tpu.decode.sampler import quantize_kv_cache

        self_kv = [quantize_kv_cache(c) for c in self_kv]
    state = gen._rows({"self": self_kv, "xattn": [], "kv_start": None,
                       "n_media": None, "kv_media": None})
    gen0 = gen._rows_gen(model.init_gen_caches(b, max_new,
                                               quantized=quantized))

    def step(p, tok, state, caches, pos):
        ds = dict(state, gen=caches, step=jnp.int32(0), gen_index=None)
        return model.apply({"params": p}, tok, positions=pos, decode_state=ds)

    tok = jax.device_put(np.full((b, 1), 11, np.int32), bshard)
    pos = jax.device_put(np.full((b, 1), t, np.int32), bshard)
    _, gen1 = jax.jit(step)(params, tok, state, gen0, pos)

    # the carry contract: caches come back with the shardings they went
    # in with — a decode while-loop never pays a reshard per step
    in_flat = jax.tree.leaves(gen0)
    out_flat = jax.tree.leaves(gen1)
    assert len(in_flat) == len(out_flat) > 0
    for a, o in zip(in_flat, out_flat):
        assert o.sharding.is_equivalent_to(a.sharding, a.ndim), (
            a.sharding, o.sharding)
    # and rows really are distributed over the data axes, not replicated
    kv0 = gen1[0]["k"]  # [B, Hkv, max_new, D] heads-major, rows axis 0
    assert kv0.sharding.shard_shape(kv0.shape)[0] == b // 4


_SPMD_SCRIPT = textwrap.dedent(
    """
    import dataclasses
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp, numpy as np
    from unimp_tpu.parallel import make_mesh, sequence_sharding
    from unimp_tpu.parallel.sharding import batch_sharding, param_sharding
    from unimp_tpu.models import UniMPModel, compute_q_media, get_config
    from unimp_tpu.data.transforms import normalize_on_device
    from unimp_tpu.decode import GenerationConfig, Generator

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg = get_config("debug", dtype="float32")
    cfg = cfg.replace(lm=dataclasses.replace(cfg.lm, vocab_size=1024))
    model = UniMPModel(cfg)
    media_id = 7
    b, t = 8, 32
    rng = np.random.default_rng(0)
    ids_np = rng.integers(10, 1000, size=(b, t)).astype(np.int32)
    ids_np[:, 1] = media_id
    images = rng.integers(0, 255, size=(b, 1, 28, 28, 3)).astype(np.uint8)

    ids = jnp.asarray(ids_np)
    params = model.init(
        jax.random.PRNGKey(0), ids,
        vision_x=normalize_on_device(jnp.asarray(images)),
        q_media=compute_q_media(ids, media_id),
    )["params"]
    params = jax.device_put(params, param_sharding(params, mesh))
    bshard = batch_sharding(mesh)

    latents = jax.jit(
        lambda p, v: model.apply({"params": p}, normalize_on_device(v),
                                 method=type(model).encode_vision),
        out_shardings=bshard,
    )(params, jax.device_put(images, bshard))
    gen = Generator(
        model,
        GenerationConfig(max_new_tokens=4, eos_id=2, pad_id=2,
                         num_beams=2, num_return_sequences=2),
        media_id=media_id, mesh=mesh,
    )
    tokens, _ = gen.generate(
        params, jax.device_put(ids_np, bshard),
        jax.device_put(np.full((b,), t, np.int32), bshard), latents,
    )
    np.asarray(tokens)

    def fwd(p):
        logits, _ = model.apply(
            {"params": p}, ids,
            vision_x=normalize_on_device(jnp.asarray(images)),
            q_media=compute_q_media(ids, media_id),
        )
        return logits

    with sequence_sharding(mesh, seq_axis="fsdp", batch_axis="dp"):
        np.asarray(jax.jit(fwd)(params))
    print("SPMD_CLEAN_RUN_DONE")
    """
)


def test_mesh_eval_and_ring_emit_no_involuntary_remat(tmp_path):
    script = tmp_path / "spmd_check.py"
    script.write_text(_SPMD_SCRIPT)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SPMD_CLEAN_RUN_DONE" in proc.stdout
    assert "Involuntary full rematerialization" not in proc.stderr, (
        proc.stderr[-3000:])
