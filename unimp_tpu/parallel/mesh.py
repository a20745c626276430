"""Device mesh construction and multi-host bootstrap.

TPU-native replacement for the reference's NCCL process-group init
(/root/reference/UniMP/pipeline/train/distributed.py:44-127): rank/world
discovery from the same launcher env conventions, but the result is a
single `jax.sharding.Mesh` over all devices — gradient allreduce,
optimizer-state sharding (ZeRO-equivalent) and tensor parallelism are
expressed as sharding annotations and compiled to ICI/DCN collectives by
XLA rather than hand-called NCCL ops.

Axes:
  dp    pure data parallelism (params replicated)
  fsdp  data parallelism with parameters/optimizer sharded (ZeRO-3-ish)
  tp    tensor parallelism over attention heads / MLP columns
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def world_info_from_env():
    """Rank discovery, same env conventions as the reference
    (distributed.py:44-65): torchrun/SLURM/OMPI variables."""
    for rank_var in ("RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK"):
        if rank_var in os.environ:
            rank = int(os.environ[rank_var])
            break
    else:
        rank = 0
    for ws_var in ("WORLD_SIZE", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        if ws_var in os.environ:
            world = int(os.environ[ws_var])
            break
    else:
        world = 1
    return rank, world


def init_distributed(coordinator: Optional[str] = None):
    """Multi-host bootstrap: call once per process before device use."""
    rank, world = world_info_from_env()
    if world > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator or os.environ.get("MASTER_ADDR"),
            num_processes=world,
            process_id=rank,
        )
    return rank, world


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("dp", "fsdp", "tp") mesh. dp=None -> all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"{dp}*{fsdp}*{tp} != {n}"
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))
