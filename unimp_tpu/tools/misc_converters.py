"""Miscellaneous converters (reference pipeline/utils C31 family).

  * apply_delta      — reconstruct target weights from a base checkpoint
    plus a delta (vicuna-style; reference apply_delta.py), as pytrees
  * jsonl sharding   — interleaved web-corpus records -> size-bounded
    jsonl shards, the storage-agnostic equivalent of
    convert_mmc4_to_wds.py (tar/webdataset is replaced by plain shards
    that unimp_tpu.data.webdata streams)
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List

import jax
import numpy as np


def apply_delta(base_params, delta_params):
    """target = base + delta, leaf-wise; shapes must match."""
    def add(b, d):
        b = np.asarray(b)
        d = np.asarray(d)
        if b.shape != d.shape:
            raise ValueError(f"shape mismatch {b.shape} vs {d.shape}")
        return b + d

    return jax.tree.map(add, base_params, delta_params)


def make_delta(base_params, target_params):
    return jax.tree.map(
        lambda b, t: np.asarray(t) - np.asarray(b), base_params, target_params
    )


def shard_jsonl(
    records: Iterable[dict], out_dir: str, *, prefix: str = "shard",
    max_records_per_shard: int = 10_000,
) -> List[str]:
    """Write records into {out_dir}/{prefix}-{i:05d}.jsonl shards."""
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    buf: List[str] = []

    def flush():
        if not buf:
            return
        path = os.path.join(out_dir, f"{prefix}-{len(paths):05d}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(buf) + "\n")
        paths.append(path)
        buf.clear()

    for rec in records:
        buf.append(json.dumps(rec))
        if len(buf) >= max_records_per_shard:
            flush()
    flush()
    return paths


def convert_interleaved_corpus(
    manifest_path: str, out_dir: str, **kw
) -> List[str]:
    """MMC4-style interleaved docs (one JSON per line: {"text_list",
    "image_info", ...}) -> jsonl shards (convert_mmc4_to_wds.py parity)."""
    def gen():
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    return shard_jsonl(gen(), out_dir, **kw)
