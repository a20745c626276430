"""Export trained params to a torch state dict (reference naming).

The reverse of tools/convert_torch.py: writes a ``.pt`` whose tensor
names/layouts follow the reference's OpenFlamingo conventions (the
``--save_hf_model`` role of the reference, mmrec.py flag), so weights
trained here can be loaded back into the reference stack or inspected
with torch tooling. Only decoder-family-specific names differ; the
reverse mapping mirrors convert_torch's tables (fused QKV re-packed).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _flatten(params, prefix=()):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def export_state_dict(params, lm_family: str = "neox") -> Dict[str, np.ndarray]:
    """Flax tree -> torch-layout state dict with OpenFlamingo names."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}

    def put(name, val):
        out[name] = np.ascontiguousarray(val)

    # collect fused qkv per decoder block for re-packing
    import re

    qkv: Dict[str, Dict[str, np.ndarray]] = {}
    fused_kv: Dict[str, Dict[str, np.ndarray]] = {}  # resampler/xattn to_kv
    for path, val in flat.items():
        path = path.replace("/scale", "/weight")
        m = re.match(r"block_(\d+)/attn/([qkv])_proj/(kernel|bias)", path)
        if m:
            qkv.setdefault(m.group(1), {})[f"{m.group(2)}_{m.group(3)}"] = val
            continue
        m = re.match(r"(resampler/block_\d+/attn|xattn_\d+/xattn)/([kv])_proj/kernel", path)
        if m:
            fused_kv.setdefault(m.group(1), {})[m.group(2)] = val
            continue
        # vision tower
        m = re.match(r"vision/(.*)", path)
        if m:
            sub = m.group(1)
            base = "vision_encoder.vision_model"
            if sub == "patch_embed/kernel":
                # [kh*kw*in, out] -> conv [out, in, kh, kw]
                out_dim = val.shape[1]
                k_sq = val.shape[0] // 3
                kh = int(round(k_sq ** 0.5))
                conv = val.reshape(kh, kh, 3, out_dim).transpose(3, 2, 0, 1)
                put(f"{base}.embeddings.patch_embedding.weight", conv)
                continue
            sub = (
                sub.replace("patch_embed/kernel", "embeddings.patch_embedding.weight")
                .replace("cls_token", "embeddings.class_embedding")
                .replace("pos_embed", "embeddings.position_embedding.weight")
                .replace("pre_ln/", "pre_layrnorm.")
                .replace("post_ln/", "post_layernorm.")
            )
            sub = re.sub(r"block_(\d+)/", r"encoder.layers.\1.", sub)
            sub = (
                sub.replace("attn/q_proj/", "self_attn.q_proj.")
                .replace("attn/k_proj/", "self_attn.k_proj.")
                .replace("attn/v_proj/", "self_attn.v_proj.")
                .replace("attn/o_proj/", "self_attn.out_proj.")
                .replace("ln1/", "layer_norm1.")
                .replace("ln2/", "layer_norm2.")
                .replace("mlp/up/", "mlp.fc1.")
                .replace("mlp/down/", "mlp.fc2.")
            )
            sub = sub.replace("/scale", ".weight").replace("/", ".")
            name = f"{base}.{sub}"
            if name.endswith("kernel"):
                name = name[: -len("kernel")] + "weight"
                if val.ndim == 3:  # [in, H, d] -> [H*d, in]
                    val = val.reshape(val.shape[0], -1).T
                elif val.ndim == 2:
                    val = val.T
            put(name, val)
            continue
        # resampler / xattn / decoder shared pieces
        m = re.match(r"resampler/(.*)", path)
        if m:
            sub = m.group(1)
            if sub == "latents":
                put("perceiver.latents", val)
                continue
            sub = sub.replace("out_ln/", "norm.")
            sub = re.sub(r"block_(\d+)/", r"layers.\1.", sub)
            sub = (
                sub.replace("ln_media/", "0.norm_media.")
                .replace("ln_latents/", "0.norm_latents.")
                .replace("attn/q_proj/kernel", "0.to_q.weight")
                .replace("attn/o_proj/kernel", "0.to_out.weight")
                .replace("ln_ff/", "1.0.")
                .replace("mlp/up/kernel", "1.1.weight")
                .replace("mlp/down/kernel", "1.3.weight")
            )
            sub = sub.replace("/scale", ".weight").replace("/", ".")
            val2 = val
            if sub.endswith(".weight") and val.ndim >= 2:
                val2 = val.reshape(val.shape[0], -1).T if val.ndim == 3 else val.T
            put(f"perceiver.{sub}", val2)
            continue
        m = re.match(r"xattn_(\d+)/(.*)", path)
        if m:
            i, sub = m.group(1), m.group(2)
            base = f"lang_encoder.gated_cross_attn_layers.{i}"
            sub = (
                sub.replace("ln_attn/", "attn.norm.")
                .replace("xattn/q_proj/kernel", "attn.to_q.weight")
                .replace("xattn/o_proj/kernel", "attn.to_out.weight")
                .replace("ln_ff/", "ff.0.")
                .replace("mlp/up/kernel", "ff.1.weight")
                .replace("mlp/down/kernel", "ff.3.weight")
            )
            sub = sub.replace("/scale", ".weight").replace("/", ".")
            val2 = val
            if sub.endswith(".weight") and val.ndim >= 2:
                val2 = val.reshape(val.shape[0], -1).T if val.ndim == 3 else val.T
            put(f"{base}.{sub}", val2)
            continue
        m = re.match(r"block_(\d+)/(.*)", path)
        if m:
            i, sub = m.group(1), m.group(2)
            if lm_family == "neox":
                base = f"lang_encoder.gpt_neox.layers.{i}"
                sub = (
                    sub.replace("ln1/", "input_layernorm.")
                    .replace("ln2/", "post_attention_layernorm.")
                    .replace("attn/o_proj/", "attention.dense.")
                    .replace("mlp/up/", "mlp.dense_h_to_4h.")
                    .replace("mlp/down/", "mlp.dense_4h_to_h.")
                    .replace("mlp/gate/", "mlp.gate.")  # no torch analog
                )
            else:  # mpt
                base = f"lang_encoder.transformer.blocks.{i}"
                sub = (
                    sub.replace("ln1/", "norm_1.")
                    .replace("ln2/", "norm_2.")
                    .replace("attn/o_proj/", "attn.out_proj.")
                    .replace("mlp/up/", "ffn.up_proj.")
                    .replace("mlp/down/", "ffn.down_proj.")
                )
            sub = sub.replace("/scale", ".weight").replace("/", ".")
            if sub.endswith("kernel"):
                sub = sub[: -len("kernel")] + "weight"
                val = val.reshape(val.shape[0], -1).T if val.ndim == 3 else val.T
            put(f"{base}.{sub}", val)
            continue
        if path == "embed/embedding":
            name = ("lang_encoder.gpt_neox.embed_in.weight"
                    if lm_family == "neox"
                    else "lang_encoder.transformer.wte.weight")
            put(name, val)
            continue
        if path.startswith("final_ln/"):
            base = ("lang_encoder.gpt_neox.final_layer_norm"
                    if lm_family == "neox"
                    else "lang_encoder.transformer.norm_f")
            put(f"{base}.{path.split('/')[-1].replace('scale', 'weight')}", val)
            continue
        if path == "lm_head/kernel":
            put("lang_encoder.embed_out.weight", val.T)
            continue
        # fallback: our native name with dots
        put(path.replace("/", "."), val)

    # fused to_kv for resampler / gated-xattn blocks
    for owner, parts in fused_kv.items():
        kk, vk = parts["k"], parts["v"]
        w = np.concatenate(
            [kk.reshape(kk.shape[0], -1).T, vk.reshape(vk.shape[0], -1).T],
            axis=0,
        )
        m = re.match(r"resampler/block_(\d+)/attn", owner)
        if m:
            put(f"perceiver.layers.{m.group(1)}.0.to_kv.weight", w)
        else:
            i = re.match(r"xattn_(\d+)/xattn", owner).group(1)
            put(f"lang_encoder.gated_cross_attn_layers.{i}.attn.to_kv.weight", w)

    # re-pack fused qkv per block
    for i, parts in qkv.items():
        if lm_family == "neox":
            # [in, H, d] x3 -> per-head interleaved [H*3*d, in]
            qk, kk, vk = parts["q_kernel"], parts["k_kernel"], parts["v_kernel"]
            h, d = qk.shape[1], qk.shape[2]
            stacked = np.stack(
                [qk.transpose(1, 2, 0), kk.transpose(1, 2, 0),
                 vk.transpose(1, 2, 0)], axis=1,
            )  # [H, 3, d, in]
            put(
                f"lang_encoder.gpt_neox.layers.{i}.attention.query_key_value.weight",
                stacked.reshape(h * 3 * d, -1),
            )
            if "q_bias" in parts:
                bs = np.stack(
                    [parts["q_bias"], parts["k_bias"], parts["v_bias"]], axis=1
                )  # [H, 3, d]
                put(
                    f"lang_encoder.gpt_neox.layers.{i}.attention.query_key_value.bias",
                    bs.reshape(-1),
                )
        else:
            qk, kk, vk = parts["q_kernel"], parts["k_kernel"], parts["v_kernel"]
            w = np.concatenate(
                [x.reshape(x.shape[0], -1).T for x in (qk, kk, vk)], axis=0
            )
            put(f"lang_encoder.transformer.blocks.{i}.attn.Wqkv.weight", w)
    return out


def save_torch_checkpoint(params, path: str, lm_family: str = "neox"):
    import torch

    sd = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
          for k, v in export_state_dict(params, lm_family).items()}
    torch.save({"model_state_dict": sd}, path)
    return path
