"""Trainable/frozen parameter partitioning.

The reference trains only the perceiver resampler, the gated
cross-attention blocks, and the (resized, hence trainable) token
embeddings / lm head; the CLIP vision tower and the LM backbone stay
frozen (open_flamingo factory ``requires_grad_(False)`` then unfreezing
perceiver/gated_cross_attn_layers/input embeddings, and
``resize_token_embeddings`` at /root/reference/UniMP/mmrec.py:595
replacing embed+head with fresh trainable modules).

Rather than zeroing updates (which still computes dW for every frozen
kernel and allocates Adam moments for the full tree), the trainer
partitions the param tree: gradients are taken with respect to the
trainable subtree only, so XLA never emits the frozen dW matmuls (the
whole vision-tower backward disappears), and the optimizer state exists
only for trainable leaves. Frozen leaves can additionally be stored in
the compute dtype (bf16) — they are never updated, and the forward
casts to bf16 anyway, so this halves their HBM footprint for free.

Partitioned trees use ``None`` leaves for the other side (the
equinox-style filter/combine pattern); ``jax.tree`` utilities skip
``None`` nodes, so optax/grad/checkpoint all work on them unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_none(x):
    return x is None


def _quant_leaf(x):
    from unimp_tpu.utils.quant import QuantizedKernel

    return isinstance(x, QuantizedKernel)


def path_mask(params, predicate) -> dict:
    """Bool pytree: predicate("a/b/c", leaf) per leaf.

    QuantizedKernel leaves (int8-frozen runs) count as single leaves so
    the mask keeps the same structure the optimizer was built over."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=_quant_leaf
    )
    out = []
    for kp, leaf in flat:
        path = "/".join(p.key if hasattr(p, "key") else str(p) for p in kp)
        out.append(bool(predicate(path, leaf)))
    return jax.tree_util.tree_unflatten(treedef, out)


def backbone_trainable_mask(params) -> dict:
    """Reference freezing: train resampler + gated xattn + embed/lm_head;
    freeze the vision tower and the LM backbone blocks/final norm."""

    def trainable(path, leaf):
        top = path.split("/", 1)[0]
        return (
            top == "resampler"
            or top.startswith("xattn_")
            or top in ("embed", "lm_head")
        )

    return path_mask(params, trainable)


def partition_params(params, trainable_mask):
    """-> (trainable, frozen): same treedef, complementary None leaves."""
    trainable = jax.tree.map(
        lambda m, x: x if m else None, trainable_mask, params
    )
    frozen = jax.tree.map(
        lambda m, x: None if m else x, trainable_mask, params
    )
    return trainable, frozen


def merge_params(trainable, frozen):
    """Inverse of partition_params (equinox ``combine``)."""
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=_is_none,
    )


def cast_tree(tree, dtype):
    """Cast floating-point leaves (None-tolerant)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
