"""Sequence-parallel (ring) attention context.

Enables context parallelism — a capability beyond the reference, which
has none (SURVEY.md §5 long-context) — without threading a mesh through
every module: the trainer (or a test) activates a sequence-sharding
context, and `ops.attention.multi_head_attention` routes *causal
self-attention* through `ring_attention_sharded` over the mesh. The
context is read at trace time (everything under jit traces once), so a
plain module-level setting is safe.

Only causal self-attention (q and kv from the same sequence, no media
masking, no ALiBi) is routed — ViT / perceiver / gated-xattn keep their
normal paths. Enable with ``--seq_shard`` on the CLI or::

    with sequence_sharding(mesh, seq_axis="fsdp", batch_axis="dp"):
        ... trace/jit the train step ...
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SeqShardContext:
    mesh: object
    seq_axis: str = "fsdp"
    batch_axis: str = "dp"


_ACTIVE: Optional[SeqShardContext] = None


def set_sequence_sharding(mesh, seq_axis: str = "fsdp",
                          batch_axis: str = "dp") -> None:
    """Globally enable ring attention for causal self-attention."""
    global _ACTIVE
    _ACTIVE = (
        None if mesh is None else SeqShardContext(mesh, seq_axis, batch_axis)
    )


def get_sequence_sharding() -> Optional[SeqShardContext]:
    return _ACTIVE


@contextlib.contextmanager
def sequence_sharding(mesh, seq_axis: str = "fsdp", batch_axis: str = "dp"):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = SeqShardContext(mesh, seq_axis, batch_axis)
    try:
        yield
    finally:
        _ACTIVE = prev
