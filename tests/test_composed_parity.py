"""Composed-pipeline quality parity (VERDICT r3 item 3).

The same tiny model is trained through BOTH stacks — the reference's own
vendored torch LLaMA under the reference training/eval semantics, and
the full unimp-tpu path (synth data -> dataset/prompts/tokenizer/
collate/loader -> train/loss.py + train/optimizer.py -> evaluate_rec
batched beam decode -> evals/metrics.py) — from the same converted
initial weights on the same materialized batches. HR@10 / NDCG@10 must
land within 1% (the BASELINE.md north-star clause), and the per-step
training losses must track at float32 noise level.

See benchmarks/parity_check.py for the full protocol and citations.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

REF = "/root/reference/UniMP"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)


@needs_ref
@pytest.mark.slow
def test_composed_quality_parity():
    import parity_check

    # multi-task mixture (search/exp/img_sel subsampled 25%, rec final —
    # rec_dataset.py:180-206 semantics), rec eval protocol
    record = parity_check.main([
        "--steps", "60", "--n-users", "240", "--n-items", "32",
        "--tasks", "search,exp,img_sel,rec",
    ])
    # per-step losses must track at f32-accumulation noise level: this is
    # the composed data+masking+loss+optimizer path agreeing, not luck
    assert record["train_loss_max_gap"] < 5e-3, record["train_loss_max_gap"]
    for k in ("hr@10", "ndcg@10", "hr@5", "mrr@10"):
        assert record["delta"][k] <= 0.026, (k, record)  # 1 flip in 40 users
    assert record["jax"]["n_users"] == 40


@needs_ref
def test_powered_parity_record_is_committed():
    """The SHIPPED parity evidence must be powered: >=500 evaluated
    users (one beam flip <= 0.2%), multi-task training, every rank-metric
    delta within the BASELINE.md 1% clause WITH margin (VERDICT r4
    item 4). Regenerate with:
    python benchmarks/parity_check.py --steps 150 --n-users 3000
        --n-items 32 --tasks search,exp,img_sel,rec --out <record>"""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "records", "parity_composed_multitask_cpu.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["jax"]["n_users"] >= 500
    assert "," in rec["config"]["tasks"]
    assert rec["train_loss_max_gap"] < 5e-3
    for k, v in rec["delta"].items():
        assert v <= 0.005, (k, v)  # half the 1% clause
