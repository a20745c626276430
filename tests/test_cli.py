"""End-to-end CLI smoke: train 1 epoch on synthetic data, eval, transfer.

This is the framework-level integration test the reference lacks
(SURVEY.md §4): full path from JSON+images on disk through training,
checkpointing, eval-only reload, and the frozen transfer run.
"""

import json
import os

import pytest

from unimp_tpu.tools import synth_data


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data = tmp_path_factory.mktemp("data")
    runs = tmp_path_factory.mktemp("runs")
    synth_data.generate(str(data), n_items=32, n_users=16, image_size=28)
    return str(data), str(runs)


def _common_args(data, runs, task="rec"):
    return [
        "--pretrained_model_name_or_path=debug",
        f"--mmrec_path={data}",
        f"--external_save_dir={runs}",
        "--subset=beauty",
        f"--task={task}",
        "--single_task",
        "--n_items=32",
        "--history_len=5",
        "--patch-image-size=28",
        "--batch_size=8",
        "--eval_batch_size=4",
        "--num_epochs=1",
        "--logging_steps=1",
        "--warmup_steps=0",
        "--workers=0",
        "--num_beams=3",
        "--max_records=8",
        "--precision=fp32",
    ]


def test_train_eval_transfer_cli(env):
    data, runs = env
    from unimp_tpu.cli import mmrec, mmrec_eval, mmrec_prefix

    # ---- train one epoch with per-epoch test eval
    state = mmrec.main(
        _common_args(data, runs) + ["--run_name=smoke", "--do_test",
                                    "--use_reweight"]
    )
    assert state is not None
    run_dir = os.path.join(runs, "smoke")
    assert os.path.isdir(os.path.join(run_dir, "final_weights"))
    assert os.path.isdir(os.path.join(run_dir, "weights_epoch_0"))
    metrics_file = os.path.join(run_dir, "smoke_metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_file)]
    assert any("loss_multi_instruct" in l for l in lines)
    assert any("rec/hr@3" in l for l in lines)

    # ---- eval-only reload
    results = mmrec_eval.main(
        _common_args(data, runs)
        + ["--run_name=smoke", "--do_test", "--load_weights_name=final_weights"]
    )
    assert "rec" in results and 0.0 <= results["rec"]["hr@10"] <= 1.0
    assert os.path.exists(os.path.join(run_dir, "eval_results.json"))

    # ---- transfer: frozen backbone fine-tune from the checkpoint
    state2 = mmrec_prefix.main(
        _common_args(data, runs)
        + [
            "--run_name=smoke",
            "--transfer_domain=office",
            "--load_weights_name=final_weights",
        ]
    )
    assert state2 is not None


def test_transfer_freezes_backbone(env):
    data, runs = env
    from unimp_tpu.cli.mmrec_prefix import frozen_mask
    import jax

    # any param tree shape works; use a nested stand-in
    tree = {
        "resampler": {"latents": 1.0},
        "xattn_0": {"xattn": {"q_proj": {"kernel": 1.0}}},
        "embed": {"embedding": 1.0},
        "block_0": {"attn": {"q_proj": {"kernel": 1.0}}},
    }
    mask = frozen_mask(tree)
    assert mask["resampler"]["latents"] is False
    assert mask["xattn_0"]["xattn"]["q_proj"]["kernel"] is False
    assert mask["embed"]["embedding"] is False
    assert mask["block_0"]["attn"]["q_proj"]["kernel"] is True


def test_multitask_curriculum_cli(env):
    """Multi-task mixture (25% subsample) + curriculum loader rebuild."""
    data, runs = env
    from unimp_tpu.cli import mmrec

    state = mmrec.main(
        [
            "--pretrained_model_name_or_path=debug",
            f"--mmrec_path={data}",
            f"--external_save_dir={runs}",
            "--subset=beauty",
            "--task=exp",
            "--n_items=32",
            "--history_len=5",
            "--patch-image-size=28",
            "--batch_size=8",
            "--num_epochs=2",
            "--logging_steps=1",
            "--warmup_steps=0",
            "--workers=0",
            "--max_records=8",
            "--precision=fp32",
            "--run_name=multi",
            "--train_method=continue",
            "--use_reweight",
        ]
    )
    assert state is not None
    assert int(state.step) >= 2
