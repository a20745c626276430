"""Model forward-pass tests: shapes, gating, cache-consistency."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from unimp_tpu.models import UniMPModel, compute_q_media, get_config


def _setup(batch=2, n_media=3, seq=48, seed=0):
    cfg = get_config("debug", dtype="float32")
    model = UniMPModel(cfg)
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    img = cfg.vision.image_size
    vision_x = jax.random.normal(k1, (batch, n_media, img, img, 3), jnp.float32)
    media_id = 7
    ids = jax.random.randint(k2, (batch, seq), 10, cfg.lm.vocab_size)
    # plant media tokens at fixed positions
    for pos in (1, 12, 25):
        ids = ids.at[:, pos].set(media_id)
    q_media = compute_q_media(ids, media_id)
    params = model.init(
        k3, ids, vision_x=vision_x, q_media=q_media
    )["params"]
    return cfg, model, params, vision_x, ids, q_media


@pytest.mark.slow
def test_forward_shapes_and_gating():
    cfg, model, params, vision_x, ids, q_media = _setup()
    logits, _ = model.apply(
        {"params": params}, ids, vision_x=vision_x, q_media=q_media
    )
    assert logits.shape == (ids.shape[0], ids.shape[1], cfg.lm.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()

    # Gates init to 0 -> multimodal forward == text-only forward at init.
    text_logits, _ = model.apply({"params": params}, ids)
    np.testing.assert_allclose(logits, text_logits, atol=1e-5, rtol=1e-5)


def test_media_content_changes_logits_after_gate_opens():
    cfg, model, params, vision_x, ids, q_media = _setup()
    # open the gates
    params = jax.tree.map(lambda x: x, params)
    for name in params:
        if name.startswith("xattn_"):
            params[name]["attn_gate"] = jnp.asarray(1.0)
            params[name]["ff_gate"] = jnp.asarray(1.0)
    l1, _ = model.apply({"params": params}, ids, vision_x=vision_x, q_media=q_media)
    l2, _ = model.apply(
        {"params": params}, ids, vision_x=vision_x * 2.0 + 0.3, q_media=q_media
    )
    assert float(jnp.max(jnp.abs(l1 - l2))) > 1e-4


@pytest.mark.slow
def test_split_cache_decode_matches_full_forward():
    """Prefill on the first s-4 tokens, decode the rest one at a time via
    the split prompt/gen cache; logits must match the full forward."""
    cfg, model, params, vision_x, ids, q_media = _setup(batch=1, seq=24)
    b, s = ids.shape
    latents = model.apply({"params": params}, vision_x, method=UniMPModel.encode_vision)

    full_logits, _ = model.apply(
        {"params": params}, ids, latents=latents, q_media=q_media
    )

    split = s - 4
    pre_ids = ids[:, :split]
    pre_pos = jnp.broadcast_to(jnp.arange(split, dtype=jnp.int32)[None], (b, split))
    logits, kv = model.apply(
        {"params": params}, pre_ids, latents=latents, q_media=q_media[:, :split],
        positions=pre_pos, return_kv=True,
    )
    np.testing.assert_allclose(
        logits, full_logits[:, :split], atol=2e-4, rtol=2e-4
    )

    from unimp_tpu.models.flamingo import UniMPModel as UM

    state = {
        "self": kv["self"],
        "xattn": kv["xattn"],
        "kv_start": jnp.zeros((b,), jnp.int32),
        "n_media": q_media[:, -1],
        "kv_media": UM.kv_media_for(latents),
    }
    gen = model.init_gen_caches(b, 8)
    step_logits = []
    for j, t in enumerate(range(split, s)):
        tok = ids[:, t : t + 1]
        pos = jnp.full((b, 1), t, jnp.int32)
        lg, gen = model.apply(
            {"params": params}, tok, positions=pos,
            decode_state=dict(state, gen=gen, step=jnp.int32(j)),
        )
        step_logits.append(lg)
    step_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(
        step_logits, full_logits[:, split:], atol=2e-4, rtol=2e-4
    )


def test_variant_configs_construct():
    for name in ("debug", "small"):
        cfg = get_config(name)
        assert cfg.lm.hidden_size % cfg.lm.num_heads == 0
    # big variants: config arithmetic only (no init)
    for name in ("3b-mpt", "4b-instruct", "9b"):
        cfg = get_config(name)
        assert cfg.vision.num_patches == 256
        assert cfg.lm.head_dim * cfg.lm.num_heads == cfg.lm.hidden_size


@pytest.mark.slow
def test_config_from_json(tmp_path):
    """Otter/Flamingo config.json -> UniMPConfig (recommender.py:421-422,
    pipeline/train/config.json field names)."""
    import json

    from unimp_tpu.models.config import config_from_json

    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({
        "model_type": "otter",
        "cross_attn_every_n_layers": 4,
        "tie_word_embeddings": False,
        "text_config": {
            "_name_or_path": "luodian/llama-7b-hf",
            "model_type": "llama",
            "hidden_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "intermediate_size": 96,
            "vocab_size": 128,
            "rms_norm_eps": 1e-6,
        },
        "vision_config": {
            "model_type": "clip_vision_model",
            "hidden_size": 32,
            "intermediate_size": 128,
            "num_attention_heads": 2,
            "num_hidden_layers": 2,
            "image_size": 28,
            "patch_size": 14,
        },
    }))
    cfg = config_from_json(str(cfg_path))
    assert cfg.cross_attn_every_n == 4
    assert cfg.lm.norm == "rmsnorm" and cfg.lm.act == "silu"  # llama family
    assert cfg.lm.hidden_size == 64 and cfg.lm.num_layers == 2
    assert cfg.lm.mlp_dim == 96 and cfg.lm.vocab_size == 128
    assert cfg.lm.tie_embeddings is False
    assert cfg.lm.layernorm_eps == 1e-6
    assert cfg.vision.image_size == 28 and cfg.vision.mlp_ratio == 4

    # the model actually builds and runs from it
    import jax

    from unimp_tpu.models import UniMPModel, compute_q_media

    model = UniMPModel(cfg.replace(dtype="float32"))
    ids = jnp.ones((1, 8), jnp.int32).at[0, 1].set(7)
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), ids,
        vision_x=jnp.zeros((1, 1, 28, 28, 3), jnp.float32),
        q_media=compute_q_media(ids, 7),
    )
    assert out[0].shape == (1, 8, 128)
