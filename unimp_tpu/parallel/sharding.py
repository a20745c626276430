"""Parameter/batch sharding rules.

The reference's only parallelism is DP + ZeRO-2 optimizer sharding via
DeepSpeed (/root/reference/UniMP/accelerate_configs/accelerate_config_
zero2.yaml). Here the same (and more) is expressed declaratively: a
path-regex -> PartitionSpec table maps every parameter onto the
("dp", "fsdp", "tp") mesh; jit then compiles the all-gathers/
reduce-scatters (FSDP) and head/column-parallel matmuls (TP) onto ICI.

With fsdp=tp=1 this degenerates to pure DP (reference parity); optimizer
state inherits the parameter specs, giving ZeRO-style sharding whenever
fsdp > 1.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_rules() -> List[Tuple[str, P]]:
    """(path regex, PartitionSpec); first match wins. Paths are
    '/'-joined flax param paths, e.g. 'block_3/attn/q_proj/kernel'."""
    return [
        # token embedding [V, D]: vocab over (fsdp, tp) — big and reused
        # as the tied LM head.
        (r".*embed/embedding$", P(("fsdp", "tp"), None)),
        (r".*lm_head/kernel$", P("fsdp", "tp")),
        # attention projections
        (r".*(q_proj|k_proj|v_proj)/kernel$", P("fsdp", "tp", None)),
        (r".*(q_proj|k_proj|v_proj)/bias$", P("tp", None)),
        (r".*o_proj/kernel$", P("tp", None, "fsdp")),
        # MLPs: column-parallel in, row-parallel out
        (r".*mlp/(up|gate)/kernel$", P("fsdp", "tp")),
        (r".*mlp/(up|gate)/bias$", P("tp")),
        (r".*mlp/down/kernel$", P("tp", "fsdp")),
        # vision patch embedding [p*p*3, D]
        (r".*patch_embed/kernel$", P(None, "fsdp")),
        # everything else (norms, gates, biases, latents, pos embeds):
        # replicated.
        (r".*", P()),
    ]


def spec_for_path(path: str, rules=None) -> P:
    for pattern, spec in rules or partition_rules():
        if re.match(pattern, path):
            return spec
    return P()


def _tree_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [
        "/".join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in kp
        )
        for kp, _ in flat
    ]
    return paths, [v for _, v in flat], treedef


def param_specs(params):
    """Pytree of PartitionSpec matching `params` leaves.

    QuantizedKernel (int8 weight-only) flattens to q/scale leaves whose
    paths gain a trailing '/.q' / '/.scale' — the q array keeps the
    KERNEL's partition rule (same shape as the float kernel) and the
    per-channel scale is replicated (it is tiny and its rank differs)."""
    paths, leaves, treedef = _tree_paths(params)
    rules = partition_rules()
    specs = []
    for path, leaf in zip(paths, leaves):
        if path.endswith("/.scale"):
            specs.append(P())
            continue
        if path.endswith("/.q"):
            path = path[: -len("/.q")]
        spec = spec_for_path(path, rules)
        # Guard: never shard a dim that isn't divisible; fall back to
        # replication of that dim (keeps tiny test models valid on 8 dev).
        fixed = []
        for i, axis in enumerate(spec):
            if axis is None or i >= leaf.ndim:
                fixed.append(None)
                continue
            fixed.append(axis)
        specs.append(P(*fixed[: leaf.ndim]) if leaf.ndim else P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def _axis_size(mesh: Mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def param_sharding(params, mesh: Mesh):
    """Pytree of NamedSharding; indivisible dims degrade to replicated."""
    specs = param_specs(params)

    def to_sharding(leaf, spec):
        fixed = []
        for i in range(leaf.ndim):
            axis = spec[i] if i < len(spec) else None
            if axis is not None and leaf.shape[i] % _axis_size(mesh, axis) != 0:
                axis = None
            fixed.append(axis)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree.map(to_sharding, params, specs)


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding over (dp, fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
