"""Instruction-tuning datasets (legacy Otter/MIMIC-IT family).

Capability parity with the reference's pretraining/instruction data path
(/root/reference/UniMP/pipeline/mm_utils/unify_dataset.py:62-443,
mimicit_dataset.py:41-120, input_dataset.py:7-60):

  * MultiInstructDataset — MIMIC-IT-style JSON: per-sample instruction/
    answer (+images), with optional in-context related samples rendered
    as "<image> User: ... GPT: <answer> ... <|endofchunk|>" chains
  * FileDataset — TSV-backed dataset with per-rank slicing for
    multi-host reads

Used for general instruction tuning on top of the same model; the UniMP
task scripts don't exercise it (SURVEY.md C9), but the framework keeps
the capability.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from unimp_tpu.data.transforms import load_resized_uint8


class MultiInstructDataset:
    """samples: {id: {"instruction", "answer", "image_ids": [...],
    "rel_ins_ids": [...]}}; images under image_dir/{image_id}.jpg."""

    def __init__(
        self,
        annotations_path: str,
        image_dir: str,
        tokenizer,
        *,
        max_incontext: int = 2,
        image_size: int = 224,
        seed: int = 0,
    ):
        with open(annotations_path) as f:
            payload = json.load(f)
        self.data: Dict[str, dict] = payload.get("data", payload)
        self.keys = list(self.data.keys())
        self.image_dir = image_dir
        self.tokenizer = tokenizer
        self.max_incontext = max_incontext
        self.image_size = image_size
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.keys)

    def _render(self, rec: dict) -> str:
        return (
            f"<image> User: {rec['instruction']} "
            f"GPT: <answer> {rec['answer']} <|endofchunk|> "
        )

    def __getitem__(self, index: int) -> dict:
        rec = self.data[self.keys[index]]
        chain = []
        rel = rec.get("rel_ins_ids", [])[: self.max_incontext]
        for rid in rel:
            if rid in self.data:
                chain.append(self.data[rid])
        chain.append(rec)
        text = "".join(self._render(r) for r in chain).rstrip()
        image_ids = [i for r in chain for i in r.get("image_ids", [])]
        images = np.stack([
            load_resized_uint8(
                os.path.join(self.image_dir, f"{i}.jpg"), self.image_size
            )
            for i in image_ids
        ]) if image_ids else np.zeros(
            (1, self.image_size, self.image_size, 3), np.uint8
        )
        ids = self.tokenizer.encode(text, add_bos=True, add_eos=True)
        return {
            "input_ids": np.asarray(ids, np.int32),
            "images": images,
            "weight": 1.0,
            "task": "instruct",
        }


class FileDataset:
    """TSV rows with per-rank slicing (input_dataset.py:47-56): rank r of
    w reads rows where row_index % w == r, enabling multi-host sharded
    streaming of very large files without an index."""

    def __init__(self, file_path: str, selected_cols: Optional[str] = None,
                 separator: str = "\t", rank: int = 0, world_size: int = 1):
        self.file_path = file_path
        self.separator = separator
        self.rank = rank
        self.world_size = world_size
        self.selected = (
            [int(c) for c in selected_cols.split(",")]
            if selected_cols else None
        )
        with open(file_path) as f:
            self.row_count = sum(1 for _ in f)

    def __len__(self):
        return (self.row_count - self.rank + self.world_size - 1) // self.world_size

    def __iter__(self):
        with open(self.file_path) as f:
            for i, line in enumerate(f):
                if i % self.world_size != self.rank:
                    continue
                cols = line.rstrip("\n").split(self.separator)
                yield [cols[c] for c in self.selected] if self.selected else cols
