"""Inference-time parameter casting.

Big-model decode is weight-bandwidth bound (every step streams the full
parameter set from HBM); casting float32 training params to bfloat16
halves that traffic — ~2x decode throughput at equal quality for
evaluation/serving. Norm scales and gates stay float32 (tiny, and the
norms upcast internally anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    def cast(path, x):
        if x.dtype != jnp.float32:
            return x
        if x.ndim <= 1:  # norm scales, biases, gates
            return x
        return x.astype(dtype)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in flat:
        path = "/".join(str(getattr(p, "key", p)) for p in kp)
        out.append(cast(path, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)
