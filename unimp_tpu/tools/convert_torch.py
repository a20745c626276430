"""Torch checkpoint conversion: reference .pt state dicts -> param pytree.

The reference trains OpenFlamingo models and saves filtered torch state
dicts (/root/reference/UniMP/mmrec.py:873-881, train_utils.py:258-265).
This converter maps those names/layouts onto the framework's Flax tree:

  * torch ``Linear.weight`` [out, in] -> flax ``kernel`` [in, out];
    attention projections reshape to DenseGeneral [in, H, head_dim]
  * fused projections split: CLIP q/k/v are separate; perceiver and
    gated-xattn ``to_kv`` [2*inner, in] split into k/v; NeoX
    ``query_key_value`` [H*3*d, in] (per-head-interleaved) and MPT
    ``Wqkv`` [3*H*d, in] split into q/k/v
  * name rewriting by pattern tables for the vision tower (HF CLIP),
    perceiver resampler + gated-xattn blocks (open_flamingo naming),
    and both decoder families (GPT-NeoX / MPT)
  * embedding tables grown by the task vocabulary copy over the
    overlapping rows (resize_token_embeddings equivalent)

Unmatched parameters keep their initialized values and are reported, so
a partially-covered checkpoint still loads (matching the reference's
``strict=False`` load, mmrec_eval.py:655-663).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def _flatten(params, prefix=()):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------- rules
# (torch-name regex, our-path template) — simple renames. Layout fixes
# (transpose/reshape/grow) happen in _fit_value; fused tensors are
# handled by _FUSED_RULES below.

_RENAME_RULES: List[Tuple[str, str]] = [
    # ---- vision tower (HF CLIP ViT; xformers_model/clip.py naming) ----
    (r"vision_encoder\.vision_model\.embeddings\.class_embedding",
     r"vision/cls_token"),
    (r"vision_encoder\.vision_model\.embeddings\.patch_embedding\.weight",
     r"vision/patch_embed/kernel"),
    (r"vision_encoder\.vision_model\.embeddings\.position_embedding\.weight",
     r"vision/pos_embed"),
    (r"vision_encoder\.vision_model\.pre_layrnorm\.(weight|bias)",
     r"vision/pre_ln/\1"),
    (r"vision_encoder\.vision_model\.post_layernorm\.(weight|bias)",
     r"vision/post_ln/\1"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)",
     r"vision/block_\1/attn/\2_proj/\3"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.(weight|bias)",
     r"vision/block_\1/attn/o_proj/\2"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.(weight|bias)",
     r"vision/block_\1/ln1/\2"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.(weight|bias)",
     r"vision/block_\1/ln2/\2"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.(weight|bias)",
     r"vision/block_\1/mlp/up/\2"),
    (r"vision_encoder\.vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.(weight|bias)",
     r"vision/block_\1/mlp/down/\2"),
    # ---- perceiver resampler (open_flamingo helpers.py naming) ----
    (r"perceiver\.latents", r"resampler/latents"),
    (r"perceiver\.norm\.(weight|bias)", r"resampler/out_ln/\1"),
    (r"perceiver\.layers\.(\d+)\.0\.norm_media\.(weight|bias)",
     r"resampler/block_\1/ln_media/\2"),
    (r"perceiver\.layers\.(\d+)\.0\.norm_latents\.(weight|bias)",
     r"resampler/block_\1/ln_latents/\2"),
    (r"perceiver\.layers\.(\d+)\.0\.to_q\.weight",
     r"resampler/block_\1/attn/q_proj/kernel"),
    (r"perceiver\.layers\.(\d+)\.0\.to_out\.weight",
     r"resampler/block_\1/attn/o_proj/kernel"),
    (r"perceiver\.layers\.(\d+)\.1\.0\.(weight|bias)",
     r"resampler/block_\1/ln_ff/\2"),
    (r"perceiver\.layers\.(\d+)\.1\.1\.weight",
     r"resampler/block_\1/mlp/up/kernel"),
    (r"perceiver\.layers\.(\d+)\.1\.3\.weight",
     r"resampler/block_\1/mlp/down/kernel"),
    # ---- gated cross-attention (open_flamingo flamingo_lm naming) ----
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.attn_gate",
     r"xattn_\1/attn_gate"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.ff_gate",
     r"xattn_\1/ff_gate"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.attn\.norm\.(weight|bias)",
     r"xattn_\1/ln_attn/\2"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.attn\.to_q\.weight",
     r"xattn_\1/xattn/q_proj/kernel"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.attn\.to_out\.weight",
     r"xattn_\1/xattn/o_proj/kernel"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.ff\.0\.(weight|bias)",
     r"xattn_\1/ln_ff/\2"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.ff\.1\.weight",
     r"xattn_\1/mlp/up/kernel"),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.ff\.3\.weight",
     r"xattn_\1/mlp/down/kernel"),
    # ---- GPT-NeoX / RedPajama decoder ----
    (r"lang_encoder\.gpt_neox\.embed_in\.weight", r"embed/embedding"),
    (r"lang_encoder\.embed_out\.weight", r"lm_head/kernel"),
    (r"lang_encoder\.gpt_neox\.final_layer_norm\.(weight|bias)",
     r"final_ln/\1"),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.input_layernorm\.(weight|bias)",
     r"block_\1/ln1/\2"),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.post_attention_layernorm\.(weight|bias)",
     r"block_\1/ln2/\2"),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.attention\.dense\.(weight|bias)",
     r"block_\1/attn/o_proj/\2"),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.mlp\.dense_h_to_4h\.(weight|bias)",
     r"block_\1/mlp/up/\2"),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.mlp\.dense_4h_to_h\.(weight|bias)",
     r"block_\1/mlp/down/\2"),
    # ---- LLaMA decoder (xformers_model/llama.py:495-767; separate
    # q/k/v projections — llama.py:212-228 — no fused tensor) ----
    (r"lang_encoder\.model\.embed_tokens\.weight", r"embed/embedding"),
    (r"lang_encoder\.lm_head\.weight", r"lm_head/kernel"),
    (r"lang_encoder\.model\.norm\.weight", r"final_ln/weight"),
    (r"lang_encoder\.model\.layers\.(\d+)\.input_layernorm\.weight",
     r"block_\1/ln1/weight"),
    (r"lang_encoder\.model\.layers\.(\d+)\.post_attention_layernorm\.weight",
     r"block_\1/ln2/weight"),
    (r"lang_encoder\.model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.weight",
     r"block_\1/attn/\2_proj/kernel"),
    (r"lang_encoder\.model\.layers\.(\d+)\.self_attn\.o_proj\.weight",
     r"block_\1/attn/o_proj/kernel"),
    (r"lang_encoder\.model\.layers\.(\d+)\.mlp\.gate_proj\.weight",
     r"block_\1/mlp/gate/kernel"),
    (r"lang_encoder\.model\.layers\.(\d+)\.mlp\.up_proj\.weight",
     r"block_\1/mlp/up/kernel"),
    (r"lang_encoder\.model\.layers\.(\d+)\.mlp\.down_proj\.weight",
     r"block_\1/mlp/down/kernel"),
    # ---- MPT decoder ----
    (r"lang_encoder\.transformer\.wte\.weight", r"embed/embedding"),
    (r"lang_encoder\.transformer\.norm_f\.(weight|bias)", r"final_ln/\1"),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.norm_1\.(weight|bias)",
     r"block_\1/ln1/\2"),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.norm_2\.(weight|bias)",
     r"block_\1/ln2/\2"),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.attn\.out_proj\.(weight|bias)",
     r"block_\1/attn/o_proj/\2"),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.ffn\.up_proj\.(weight|bias)",
     r"block_\1/mlp/up/\2"),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.ffn\.down_proj\.(weight|bias)",
     r"block_\1/mlp/down/\2"),
]

# Non-parameter buffers present in torch state dicts but recomputed here
# (RoPE caches, causal-mask bias buffers, position-id aranges). They carry
# no learned state, so they are deliberately skipped — not "missed".

_SKIP_RULES: List[str] = [
    r".*rotary_emb\.inv_freq$",
    r".*rotary_emb\.(cos|sin)_cached$",
    r".*embeddings\.position_ids$",
    r".*attention\.(bias|masked_bias)$",  # NeoX causal-mask buffers
    r".*attn\.(bias|masked_bias)$",
]


def is_skipped_buffer(name: str) -> bool:
    return any(re.fullmatch(p, name) for p in _SKIP_RULES)


# fused tensors: regex -> (list of our paths, splitter(value, targets))
# where splitter returns one array per path.


def _split_kv(val: np.ndarray, targets: List[np.ndarray]):
    """open_flamingo to_kv: [2*inner, in] -> k, v halves."""
    k, v = np.split(val, 2, axis=0)
    return [k, v]


def _split_neox_qkv(val: np.ndarray, targets: List[np.ndarray]):
    """NeoX query_key_value: [H*3*d, in] with per-head (q,k,v) blocks."""
    tq = targets[0]  # [in, H, d]
    h, d = tq.shape[1], tq.shape[2]
    if val.ndim == 2:
        out = val.reshape(h, 3, d, val.shape[1])
        return [out[:, i].reshape(h * d, -1) for i in range(3)]
    out = val.reshape(h, 3, d)
    return [out[:, i].reshape(h * d) for i in range(3)]


def _split_mpt_qkv(val: np.ndarray, targets: List[np.ndarray]):
    """MPT Wqkv: [3*H*d, in] straight thirds."""
    return list(np.split(val, 3, axis=0))


_FUSED_RULES: List[Tuple[str, List[str], Callable]] = [
    (r"perceiver\.layers\.(\d+)\.0\.to_kv\.weight",
     [r"resampler/block_\1/attn/k_proj/kernel",
      r"resampler/block_\1/attn/v_proj/kernel"], _split_kv),
    (r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.attn\.to_kv\.weight",
     [r"xattn_\1/xattn/k_proj/kernel",
      r"xattn_\1/xattn/v_proj/kernel"], _split_kv),
    (r"lang_encoder\.gpt_neox\.layers\.(\d+)\.attention\.query_key_value\.(weight|bias)",
     [r"block_\1/attn/q_proj/KB", r"block_\1/attn/k_proj/KB",
      r"block_\1/attn/v_proj/KB"], _split_neox_qkv),
    (r"lang_encoder\.transformer\.blocks\.(\d+)\.attn\.Wqkv\.(weight|bias)",
     [r"block_\1/attn/q_proj/KB", r"block_\1/attn/k_proj/KB",
      r"block_\1/attn/v_proj/KB"], _split_mpt_qkv),
]


def _fit_value(path: str, val: np.ndarray, target: np.ndarray) -> Optional[np.ndarray]:
    """Transpose/reshape a torch tensor into the flax target layout;
    grow embeddings; None when incompatible."""
    t = np.asarray(target)
    if path.endswith("/kernel") and val.ndim >= 2:
        if val.ndim == 4:  # conv patch embed [out, in, kh, kw]
            val = val.transpose(2, 3, 1, 0).reshape(-1, val.shape[0])
        else:
            val = val.T  # [out, in] -> [in, out]
    if path.endswith("/scale"):
        pass  # layernorm weight -> rmsnorm scale
    if val.shape != t.shape:
        if val.size == t.size:
            val = val.reshape(t.shape)
        elif val.ndim == t.ndim and all(
            v <= s for v, s in zip(val.shape, t.shape)
        ):
            grown = np.array(t)
            grown[tuple(slice(0, d) for d in val.shape)] = val
            val = grown
        else:
            return None
    return val.astype(t.dtype)


def _resolve(path: str, target_flat: Dict[str, np.ndarray]) -> Optional[str]:
    """Map weight/bias suffixes onto kernel/scale/bias as present."""
    if path in target_flat:
        return path
    if path.endswith("/weight"):
        base = path[: -len("/weight")]
        for suffix in ("kernel", "scale", "embedding"):
            if f"{base}/{suffix}" in target_flat:
                return f"{base}/{suffix}"
    if path.endswith("/KB"):  # fused split placeholder: weight or bias
        base = path[: -len("/KB")]
        for suffix in ("kernel", "bias"):
            if f"{base}/{suffix}" in target_flat:
                return f"{base}/{suffix}"
    return None


def convert_state_dict(state_dict: Dict[str, np.ndarray], target_params):
    """Map a torch state dict onto target_params; returns (params, report)."""
    target_flat = _flatten(target_params)
    out = dict(target_flat)
    matched, missed, skipped = [], [], []

    def place(path: str, val: np.ndarray, origin: str):
        resolved = _resolve(path, target_flat)
        if resolved is None:
            missed.append(origin)
            return
        fitted = _fit_value(resolved, np.asarray(val), out[resolved])
        if fitted is None:
            missed.append(
                f"{origin} (shape {np.asarray(val).shape} vs {out[resolved].shape})"
            )
            return
        out[resolved] = fitted
        matched.append(origin)

    for name, val in state_dict.items():
        val = np.asarray(val)
        # 0) non-parameter buffers (RoPE caches, mask bias): recomputed here
        if is_skipped_buffer(name):
            skipped.append(name)
            continue
        # 1) fused tensors
        fused = False
        for pat, templates, splitter in _FUSED_RULES:
            m = re.fullmatch(pat, name)
            if m:
                paths = [m.expand(t) for t in templates]
                # for fused KB rules the bias variant maps via /KB resolve
                if name.endswith("bias"):
                    paths = [p.replace("/KB", "/KB") for p in paths]
                targets = []
                for p in paths:
                    r = _resolve(p, target_flat)
                    targets.append(out[r] if r else None)
                try:
                    parts = splitter(val, [
                        t if t is not None else np.zeros(0) for t in targets
                    ])
                except Exception as e:
                    missed.append(f"{name} (split failed: {e})")
                    fused = True
                    break
                for p, part in zip(paths, parts):
                    place(p, part, name)
                fused = True
                break
        if fused:
            continue
        # 2) renames
        path = None
        if name.replace(".", "/") in target_flat:
            path = name.replace(".", "/")
        else:
            for pat, tmpl in _RENAME_RULES:
                m = re.fullmatch(pat, name)
                if m:
                    path = m.expand(tmpl)
                    break
        if path is None:
            # identity fallback with weight->kernel resolution
            path = name.replace(".", "/")
        place(path, val, name)

    report = {"matched": matched, "missed": missed, "skipped": skipped}
    return _unflatten(out), report


def load_torch_checkpoint(path: str, target_params):
    """Load a .pt file (torch CPU) and convert onto target_params."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state_dict" in payload:
        payload = payload["model_state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in payload.items()}
    params, report = convert_state_dict(state, target_params)
    print(
        f"[convert] matched {len(report['matched'])} tensors, "
        f"left {len(report['missed'])} untouched"
    )
    if report["missed"]:
        for m in report["missed"][:10]:
            print(f"[convert]   unmatched: {m}")
    return params
