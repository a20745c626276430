"""Optimizer + LR schedules (reference parity, optax).

AdamW with weight decay applied only to gated-cross-attention kernels
(not gates, norms, or biases) — the reference's get_grouped_params
(/root/reference/UniMP/mmrec.py:609-631) — via optax.masked. Schedules
match transformers' get_{linear,cosine,constant}_schedule_with_warmup
(mmrec.py:682-697): linear warmup from 0 then linear/half-cosine decay
to 0 or constant. Global-norm clipping at 1.0 (mmrec.py:247-248).
Freezing (the mmrec_prefix transfer path) is a trainability mask.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> dict:
    """True where weight decay applies: gated-xattn kernels only."""

    def keep(path: str, leaf) -> bool:
        return (
            ("xattn_" in path)
            and ("gate" not in path)
            and ("ln" not in path)
            and ("bias" not in path)
            and leaf.ndim >= 2
        )

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in flat:
        path = "/".join(p.key if hasattr(p, "key") else str(p) for p in kp)
        out.append(keep(path, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_schedule(
    kind: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1))
    rest = max(total_steps - warmup_steps, 1)
    if kind == "linear":
        decay = optax.linear_schedule(base_lr, 0.0, rest)
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(base_lr, rest)
    elif kind == "constant":
        decay = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown scheduler {kind!r}")
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_optimizer(
    params,
    *,
    learning_rate: float = 1e-4,
    lr_scheduler: str = "constant",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    weight_decay: float = 0.1,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Build the reference AdamW over `params` — pass the TRAINABLE
    subtree (None leaves where frozen, see train/partition.py) to get a
    requires_grad_(False)-equivalent optimizer: moments, decay and
    clipping then exist only for trainable leaves."""
    schedule = make_schedule(lr_scheduler, learning_rate, total_steps, warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask(params)),
        optax.scale_by_learning_rate(schedule),
    )


def embedding_row_mask_update(grads, params, answer_token_id: int):
    """--mask_lm_head equivalent (mmrec.py:218-233): keep only the
    <answer> row's gradient in embedding tables."""

    def mask(path, g):
        if path.endswith("embed/embedding"):
            row = jnp.zeros(g.shape[0], g.dtype).at[answer_token_id].set(1.0)
            return g * row[:, None]
        if path.endswith("lm_head/kernel"):
            # [D, V]: the <answer> entry is a column
            col = jnp.zeros(g.shape[1], g.dtype).at[answer_token_id].set(1.0)
            return g * col[None, :]
        return g

    flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
    out = []
    for kp, leaf in flat:
        path = "/".join(p.key if hasattr(p, "key") else str(p) for p in kp)
        out.append(mask(path, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)
