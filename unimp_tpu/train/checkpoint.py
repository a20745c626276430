"""Orbax checkpointing: sharded save/restore of train state.

Replaces the reference's rank-0 torch.save of a filtered state dict
(/root/reference/UniMP/mmrec.py:873-894, train_utils.py:258-265):
Orbax writes sharded arrays from every host in parallel and restores
them onto the current mesh; the same epoch cadence and naming scheme
(weights_epoch_{e}, final_weights) is kept so run layouts look familiar.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_params(save_dir: str, params: Any, name: str = "final_weights"):
    from unimp_tpu.utils.quant import count_quantized, dequantize_params_host

    if count_quantized(params):
        # int8-frozen runs: checkpoints stay ordinary float trees so any
        # entry point (eval reload, transfer, export) restores them.
        # Dequantize leaf-by-leaf to HOST — a full on-device float copy
        # of the frozen tree would spike HBM by ~4 bytes/param exactly
        # on the memory-tight configs --frozen_int8 exists for.
        params = dequantize_params_host(params)
    path = os.path.join(os.path.abspath(save_dir), name)
    ckptr = _ckptr()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(save_dir: str, name: str, like: Optional[Any] = None):
    path = os.path.join(os.path.abspath(save_dir), name)
    ckptr = _ckptr()
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def merge_with_growth(restored, target):
    """Graft restored params onto target, tolerating grown tables.

    The transfer path (mmrec_prefix) extends the vocabulary AFTER
    pretraining, so the new embedding/LM-head rows have no stored
    counterpart — copy the overlapping region and keep the fresh init
    for the rest (the reference reaches the same state via
    resize_token_embeddings after load, mmrec_prefix.py).
    """
    import numpy as np

    def merge(path, t, r):
        t_arr = np.asarray(t)
        r_arr = np.asarray(r)
        if t_arr.shape == r_arr.shape:
            return r_arr.astype(t_arr.dtype)
        if t_arr.ndim == r_arr.ndim and all(
            rd <= td for rd, td in zip(r_arr.shape, t_arr.shape)
        ):
            out = np.array(t_arr)
            out[tuple(slice(0, d) for d in r_arr.shape)] = r_arr
            return out
        print(f"[checkpoint] keeping init for {path}: "
              f"{r_arr.shape} vs {t_arr.shape}")
        return t_arr

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(target)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    out = []
    for kp, t in flat_t:
        if kp in flat_r:
            path = "/".join(str(getattr(p, "key", p)) for p in kp)
            out.append(merge(path, t, flat_r[kp]))
        else:
            out.append(t)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_epoch(save_dir: str, params: Any, epoch: int):
    """Reference cadence: weights_epoch_{e} per epoch (mmrec.py:873-881)."""
    return save_params(save_dir, params, name=f"weights_epoch_{epoch}")


def save_train_state(save_dir: str, state, epoch: int):
    """Full resume checkpoint: params + optimizer state + step."""
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
    }
    return save_params(save_dir, payload, name=f"checkpoint_{epoch}")


def latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    cands = [
        d for d in os.listdir(save_dir)
        if d.startswith("checkpoint_") and d.split("_")[-1].isdigit()
    ]
    if not cands:
        return None
    return max(cands, key=lambda d: int(d.split("_")[-1]))
