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


def build_mimicit_train_index(
    instructions_path: str,
    out_path: str,
    *,
    round_delim: str = "_round",
) -> dict:
    """MIMIC-IT instructions JSON -> train index {final_round_id:
    rel_ins_ids}.

    The reference's get_SD/SN/llava generators
    (/root/reference/UniMP/pipeline/utils/get_SN_train_data.py:14-44)
    walk a MIMIC-IT ``{"data": {id: {instruction, answer, image_ids,
    rel_ins_ids}}}`` file, group the instruction ids by conversation
    (everything before the trailing round number), and keep only each
    conversation's FINAL round as a training sample — its
    ``rel_ins_ids`` then provide the in-context chain
    (mimicit_dataset.py:82-120; consumed here by
    data/instruct_dataset.MultiInstructDataset). This is the generic,
    source-agnostic version of those per-dataset scripts.
    """
    import re

    with open(instructions_path) as f:
        payload = json.load(f)
    data = payload.get("data", payload)

    def split_round(ins_id: str):
        m = re.match(rf"^(.*{re.escape(round_delim)})(\d+)$", ins_id)
        if m:
            return m.group(1), int(m.group(2))
        return ins_id, 0  # no round structure: every id is final

    last_round: dict = {}
    for ins_id in data:
        conv, rnd = split_round(ins_id)
        if conv not in last_round or rnd > last_round[conv][1]:
            last_round[conv] = (ins_id, rnd)

    index = {
        ins_id: list(data[ins_id].get("rel_ins_ids", []))
        for ins_id, _ in last_round.values()
    }
    with open(out_path, "w") as f:
        json.dump(index, f)
    return index


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
