"""Checkpoint-converter test: a synthetic OpenFlamingo-style state dict
(HF-CLIP vision + perceiver + gated-xattn + fused-QKV NeoX decoder)
must land on the Flax tree with correct layouts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimp_tpu.models import UniMPModel, compute_q_media
from unimp_tpu.models.config import (
    LMConfig,
    ResamplerConfig,
    UniMPConfig,
    VisionConfig,
)
from unimp_tpu.tools.convert_torch import convert_state_dict


def _tiny_neox_model():
    cfg = UniMPConfig(
        VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                     num_layers=1, num_heads=2),
        ResamplerConfig(num_latents=4, depth=1, num_heads=2, head_dim=16),
        LMConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                 norm="layernorm", positions="rope", rotary_pct=0.25,
                 act="gelu", parallel_block=True, use_bias=True,
                 tie_embeddings=False),
        cross_attn_every_n=2,
        dtype="float32",
    )
    model = UniMPModel(cfg)
    ids = jnp.ones((1, 8), jnp.int32).at[0, 1].set(7)
    vision = jnp.zeros((1, 1, 28, 28, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), ids, vision_x=vision,
        q_media=compute_q_media(ids, 7),
    )["params"]
    return cfg, model, params


@pytest.mark.slow
def test_openflamingo_state_dict_maps():
    cfg, model, params = _tiny_neox_model()
    rng = np.random.default_rng(0)
    h = cfg.lm.hidden_size
    heads, hd = cfg.lm.num_heads, cfg.lm.head_dim
    vh = cfg.vision.hidden_size
    dv = cfg.resampler.num_heads * cfg.resampler.head_dim

    sd = {}
    # vision
    sd["vision_encoder.vision_model.embeddings.class_embedding"] = (
        rng.normal(size=(vh,)).astype(np.float32))
    sd["vision_encoder.vision_model.embeddings.patch_embedding.weight"] = (
        rng.normal(size=(vh, 3, 14, 14)).astype(np.float32))
    sd["vision_encoder.vision_model.encoder.layers.0.self_attn.q_proj.weight"] = (
        rng.normal(size=(vh, vh)).astype(np.float32))
    # perceiver fused kv
    sd["perceiver.latents"] = rng.normal(size=(4, vh)).astype(np.float32)
    sd["perceiver.layers.0.0.to_kv.weight"] = (
        rng.normal(size=(2 * dv, vh)).astype(np.float32))
    sd["perceiver.layers.0.0.to_q.weight"] = (
        rng.normal(size=(dv, vh)).astype(np.float32))
    # gated xattn
    sd["lang_encoder.gated_cross_attn_layers.0.attn_gate"] = np.float32(0.5)
    sd["lang_encoder.gated_cross_attn_layers.0.attn.to_kv.weight"] = (
        rng.normal(size=(2 * h, vh)).astype(np.float32))
    # NeoX decoder with fused per-head qkv
    qkv = rng.normal(size=(heads, 3, hd, h)).astype(np.float32)
    sd["lang_encoder.gpt_neox.layers.0.attention.query_key_value.weight"] = (
        qkv.reshape(heads * 3 * hd, h))
    sd["lang_encoder.gpt_neox.layers.0.attention.query_key_value.bias"] = (
        rng.normal(size=(heads, 3, hd)).astype(np.float32).reshape(-1))
    sd["lang_encoder.gpt_neox.layers.0.input_layernorm.weight"] = (
        np.full((h,), 2.0, np.float32))
    sd["lang_encoder.gpt_neox.embed_in.weight"] = (
        rng.normal(size=(60, h)).astype(np.float32))  # grown 60 -> 64
    sd["lang_encoder.embed_out.weight"] = (
        rng.normal(size=(64, h)).astype(np.float32))

    out, report = convert_state_dict(sd, params)
    assert not any("split failed" in m for m in report["missed"]), report["missed"]

    # vision patch embed: conv -> [p*p*3, vh]
    np.testing.assert_allclose(
        out["vision"]["patch_embed"]["kernel"],
        sd["vision_encoder.vision_model.embeddings.patch_embedding.weight"]
        .transpose(2, 3, 1, 0).reshape(-1, vh),
    )
    # CLS token reshaped to [1, 1, vh]
    assert out["vision"]["cls_token"].shape == params["vision"]["cls_token"].shape
    # perceiver kv split halves, transposed to [in, H, d]
    kv = sd["perceiver.layers.0.0.to_kv.weight"]
    np.testing.assert_allclose(
        out["resampler"]["block_0"]["attn"]["k_proj"]["kernel"].reshape(vh, dv),
        kv[:dv].T,
    )
    np.testing.assert_allclose(
        out["resampler"]["block_0"]["attn"]["v_proj"]["kernel"].reshape(vh, dv),
        kv[dv:].T,
    )
    # gate scalar
    assert float(out["xattn_0"]["attn_gate"]) == 0.5
    # NeoX fused qkv: per-head interleave → q kernel [h, heads, hd]
    np.testing.assert_allclose(
        out["block_0"]["attn"]["q_proj"]["kernel"],
        qkv[:, 0].reshape(heads * hd, h).T.reshape(h, heads, hd),
    )
    np.testing.assert_allclose(
        out["block_0"]["attn"]["v_proj"]["kernel"],
        qkv[:, 2].reshape(heads * hd, h).T.reshape(h, heads, hd),
    )
    # layernorm weight -> flax LayerNorm "scale"
    np.testing.assert_allclose(out["block_0"]["ln1"]["scale"], 2.0)
    # embedding growth 60 -> 64: first rows copied, rest kept from init
    np.testing.assert_allclose(
        out["embed"]["embedding"][:60],
        sd["lang_encoder.gpt_neox.embed_in.weight"],
    )
    # lm head [V, h] -> [h, V]
    np.testing.assert_allclose(
        out["lm_head"]["kernel"], sd["lang_encoder.embed_out.weight"].T
    )
    assert len(report["matched"]) >= 12


def test_export_import_roundtrip(tmp_path):
    """params -> torch .pt (reference names) -> converted back == params."""
    cfg, model, params = _tiny_neox_model()
    from unimp_tpu.tools.convert_torch import load_torch_checkpoint
    from unimp_tpu.tools.export_torch import save_torch_checkpoint

    p = str(tmp_path / "export.pt")
    save_torch_checkpoint(params, p, lm_family="neox")

    # fresh-init target, then load the exported checkpoint back
    import jax

    fresh = model.init(
        jax.random.PRNGKey(1),
        jnp.ones((1, 8), jnp.int32).at[0, 1].set(7),
        vision_x=jnp.zeros((1, 1, 28, 28, 3), jnp.float32),
        q_media=jnp.zeros((1, 8), jnp.int32),
    )["params"]
    restored = load_torch_checkpoint(p, fresh)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    n_match = 0
    mismatches = []
    for kp, a in flat_a:
        b = flat_b[kp]
        path = "/".join(str(getattr(x, "key", x)) for x in kp)
        if np.asarray(a).shape == np.asarray(b).shape and np.allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ):
            n_match += 1
        else:
            mismatches.append(path)
    # everything except the SwiGLU-only gate (absent in reference naming)
    # must round-trip exactly
    real_misses = [m for m in mismatches if "gate" not in m]
    assert not real_misses, real_misses


# ---------------------------------------------------------------------------
# Ground truth from the reference's OWN torch classes
# (/root/reference/UniMP/xformers_model/{llama,clip}.py). xformers is
# stubbed with an exact plain-torch memory_efficient_attention so the
# modules both instantiate AND run forward — giving real state-dict
# names/layouts and real output logits to verify the converter against.

import os

import pytest

REF = "/root/reference/UniMP"


def _stub_xformers():
    import sys
    import types

    if "xformers.ops" in sys.modules:
        return
    import torch

    def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0, scale=None):
        # xops layout: [B, M, H, D]; attn_bias not None -> causal.
        scale = scale if scale is not None else q.shape[-1] ** -0.5
        att = torch.einsum("bmhd,bnhd->bhmn", q.float(), k.float()) * scale
        if attn_bias is not None:
            m, n = att.shape[-2:]
            keep = torch.tril(torch.ones(m, n, dtype=torch.bool))
            att = att.masked_fill(~keep, float("-inf"))
        att = att.softmax(-1)
        return torch.einsum("bhmn,bnhd->bmhd", att, v.float()).to(v.dtype)

    ops = types.ModuleType("xformers.ops")
    ops.memory_efficient_attention = memory_efficient_attention

    class LowerTriangularMask:
        pass

    ops.LowerTriangularMask = LowerTriangularMask
    xf = types.ModuleType("xformers")
    xf.ops = ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = ops


def _reference_classes():
    import sys

    _stub_xformers()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from xformers_model.clip import CLIPVisionModel
    from xformers_model.llama import LlamaForCausalLM

    return LlamaForCausalLM, CLIPVisionModel


def _tiny_llama_cfg():
    from transformers import LlamaConfig

    return LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
    )


def _tiny_clip_cfg():
    from transformers import CLIPVisionConfig

    return CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )


needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)


@needs_ref
def test_reference_state_dicts_fully_map():
    """Every tensor of the reference's real LlamaForCausalLM +
    CLIPVisionModel state_dict() maps (or is a deliberately-skipped
    RoPE/mask buffer) — nothing lands in `missed`."""
    import torch

    LlamaForCausalLM, CLIPVisionModel = _reference_classes()
    torch.manual_seed(0)
    tl = LlamaForCausalLM(_tiny_llama_cfg()).eval()
    tv = CLIPVisionModel(_tiny_clip_cfg()).eval()
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in tl.state_dict().items()}
    sd.update(
        {f"vision_encoder.{k}": v.numpy() for k, v in tv.state_dict().items()}
    )

    cfg = UniMPConfig(
        VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                     num_layers=2, num_heads=2),
        ResamplerConfig(num_latents=4, depth=1, num_heads=2, head_dim=16),
        LMConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                 mlp_hidden=48, norm="rmsnorm", positions="rope", act="silu",
                 parallel_block=False, use_bias=False, tie_embeddings=False,
                 layernorm_eps=1e-5),
        cross_attn_every_n=2, dtype="float32",
    )
    model = UniMPModel(cfg)
    ids = jnp.ones((1, 8), jnp.int32).at[0, 1].set(7)
    params = model.init(
        jax.random.PRNGKey(0), ids,
        vision_x=jnp.zeros((1, 1, 28, 28, 3), jnp.float32),
        q_media=compute_q_media(ids, 7),
    )["params"]

    out, report = convert_state_dict(sd, params)
    assert report["missed"] == [], report["missed"]
    assert set(report["matched"]) | set(report["skipped"]) == set(sd)

    h, heads, hd = 32, 2, 16
    q = sd["lang_encoder.model.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(
        out["block_0"]["attn"]["q_proj"]["kernel"], q.T.reshape(h, heads, hd)
    )
    np.testing.assert_allclose(
        out["block_0"]["mlp"]["gate"]["kernel"],
        sd["lang_encoder.model.layers.0.mlp.gate_proj.weight"].T,
    )
    np.testing.assert_allclose(
        out["block_0"]["ln1"]["scale"],
        sd["lang_encoder.model.layers.0.input_layernorm.weight"],
    )
    np.testing.assert_allclose(
        out["vision"]["block_1"]["attn"]["v_proj"]["kernel"].reshape(h, h),
        sd["vision_encoder.vision_model.encoder.layers.1.self_attn.v_proj.weight"].T,
    )


@needs_ref
def test_reference_llama_forward_parity():
    """Converted params reproduce the reference LlamaForCausalLM logits."""
    import torch

    from unimp_tpu.models.lm import CausalLM

    LlamaForCausalLM, _ = _reference_classes()
    torch.manual_seed(1)
    tl = LlamaForCausalLM(_tiny_llama_cfg()).eval()
    ids = np.array([[1, 5, 9, 3, 7, 2, 11, 4]], np.int32)
    with torch.no_grad():
        ref_logits = tl(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

    lmcfg = LMConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        mlp_hidden=48, norm="rmsnorm", positions="rope", act="silu",
        parallel_block=False, use_bias=False, tie_embeddings=False,
        layernorm_eps=1e-5,
    )
    lm = CausalLM(lmcfg, dtype=jnp.float32)
    init = lm.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {f"lang_encoder.{k}": v.numpy() for k, v in tl.state_dict().items()}
    conv, report = convert_state_dict(sd, init)
    assert report["missed"] == [], report["missed"]
    logits, _ = lm.apply({"params": conv}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, atol=2e-3, rtol=2e-3
    )


@needs_ref
def test_reference_clip_forward_parity():
    """Converted params reproduce the reference CLIPVisionModel patch
    tokens (last_hidden_state WITHOUT post_layernorm, clip.py:469-471)."""
    import torch

    from unimp_tpu.models.vit import VisionTower

    _, CLIPVisionModel = _reference_classes()
    torch.manual_seed(2)
    tv = CLIPVisionModel(_tiny_clip_cfg()).eval()
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tv(pixel_values=torch.tensor(px)).last_hidden_state.numpy()[:, 1:]

    vcfg = VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                        num_layers=2, num_heads=2)
    tower = VisionTower(vcfg, dtype=jnp.float32)
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 3)))["params"]
    sd = {f"vision_encoder.{k}": v.numpy() for k, v in tv.state_dict().items()}
    conv, report = convert_state_dict(sd, {"vision": init})
    assert report["missed"] == [], report["missed"]
    got = tower.apply(
        {"params": conv["vision"]}, jnp.asarray(px.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)
