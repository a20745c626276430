"""Cross-host metric aggregation.

TPU-native equivalent of the reference's accelerator.gather /
gather_for_metrics calls (/root/reference/UniMP/pipeline/eval/
eval_search.py:150-155, eval_exp.py:141-154) and wait_for_everyone
barriers (mmrec.py:772-883): per-host metric lists are all-gathered over
the mesh via multihost utils; single-process runs pass through.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np


def gather_metric_lists(values: List[float]) -> np.ndarray:
    """Concatenate per-host metric lists across processes."""
    if jax.process_count() == 1:
        return np.asarray(values, np.float64)
    from jax.experimental import multihost_utils

    arr = np.asarray(values, np.float32)
    # pad to a common length so all_gather has a fixed shape
    n = np.asarray([len(arr)], np.int32)
    max_n = int(multihost_utils.process_allgather(n).max())
    padded = np.full((max_n,), np.nan, np.float32)
    padded[: len(arr)] = arr
    gathered = multihost_utils.process_allgather(padded)
    flat = gathered.reshape(-1)
    return flat[~np.isnan(flat)].astype(np.float64)


def mean_over_hosts(metrics: Dict[str, float]) -> Dict[str, float]:
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vals = np.asarray([metrics[k] for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vals)
    out = dict(zip(keys, np.mean(gathered, axis=0).tolist()))
    return out


def barrier(name: str = "sync"):
    """wait_for_everyone equivalent."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
