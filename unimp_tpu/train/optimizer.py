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
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """Build the reference AdamW over `params` — pass the TRAINABLE
    subtree (None leaves where frozen, see train/partition.py) to get a
    requires_grad_(False)-equivalent optimizer: moments, decay and
    clipping then exist only for trainable leaves.

    mu_dtype / nu_dtype store the Adam moments in a reduced dtype
    (e.g. bf16) — the standard TPU memory lever (t5x ships bf16 mu);
    accumulation still happens in f32 and is rounded on store. Defaults
    keep full f32 parity with the reference.
    """
    schedule = make_schedule(lr_scheduler, learning_rate, total_steps, warmup_steps)
    if nu_dtype is None:
        adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)
    else:
        adam = _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype)
    return optax.chain(
        _clip_by_global_norm_f32(max_grad_norm),
        adam,
        optax.add_decayed_weights(weight_decay, mask=decay_mask(params)),
        optax.scale_by_learning_rate(schedule),
    )


def _clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """clip_by_global_norm with the norm ACCUMULATED in f32.

    With --bf16_opt_state the gradient leaves arrive bf16; optax's
    global_norm sums squares in the leaf dtype, and over ~1e9 elements
    bf16's 8-bit mantissa makes the norm (hence the clip factor near the
    threshold) noisy. The per-leaf f32 upcast fuses into the reduction —
    no f32 gradient copy is materialized."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        import jax
        import jax.numpy as jnp

        sq = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(updates)
        )
        g_norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        updates = jax.tree_util.tree_map(
            lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype):
    """scale_by_adam with BOTH moments stored in reduced dtypes.

    optax only exposes mu_dtype; nu dominates the remaining state at
    3B-scale, and bf16 range covers it (nu is a mean of squares). Math
    is done in f32, storage rounds."""

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(grads, state, params=None):
        count = state.count + 1
        f32 = jnp.float32

        def upd_mu(g, m):
            return (b1 * m.astype(f32) + (1 - b1) * g.astype(f32)).astype(
                mu_dtype or g.dtype
            )

        def upd_nu(g, n):
            g = g.astype(f32)
            return (b2 * n.astype(f32) + (1 - b2) * g * g).astype(
                nu_dtype or g.dtype
            )

        mu = jax.tree.map(upd_mu, grads, state.mu)
        nu = jax.tree.map(upd_nu, grads, state.nu)
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        updates = jax.tree.map(
            lambda m, n: (m.astype(f32) / bc1)
            / (jnp.sqrt(n.astype(f32) / bc2) + eps),
            mu, nu,
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
