"""Smoke-run the reference-parity launch scripts end to end.

Each script mirrors a reference launcher (UniMP/unimp_task.sh etc.);
these tests run two of them for real — debug model, synthetic data,
tiny record caps — asserting they complete and produce the run
artifacts. Catches positional/extra-arg passthrough bugs that unit
tests cannot (the scripts are the actual user surface)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    # force the virtual-CPU backend in the subprocess: the sandbox's
    # sitecustomize registers the remote-TPU backend only when
    # PALLAS_AXON_POOL_IPS is set
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from unimp_tpu.tools import synth_data

    d = str(tmp_path_factory.mktemp("script_synth"))
    synth_data.generate(d, n_items=32, n_users=16, image_size=28)
    synth_data.build_tokenizer(d, n_items=32)
    return d


def _run(script, args, extra, synth_dir, run_dir):
    env = _env()
    env["MMREC_PATH"] = synth_dir
    cmd = ["bash", os.path.join(REPO, "scripts", script)] + args + extra
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out


COMMON = [
    "--n_items=32", "--history_len=5", "--patch-image-size=28",
    "--max_records=8", "--num_beams=2", "--eval_batch_size=4",
    "--workers=0", "--precision=fp32", "--logging_steps=1",
]


@pytest.fixture(scope="module")
def trained_run(synth_dir, tmp_path_factory):
    """One unimp_task.sh training run shared by both script tests (the
    subprocess train dominates the suite's wall time on one CPU core)."""
    run_dir = str(tmp_path_factory.mktemp("script_runs"))
    _run(
        "unimp_task.sh",
        # the 7 positional hyperparameters (lr bsz model subset task gamma accum)
        ["1e-3", "4", "debug", "beauty", "rec", "2", "1"],
        COMMON + [f"--external_save_dir={run_dir}", "--num_epochs=1",
                  "--warmup_steps=0"],
        synth_dir, run_dir,
    )
    return run_dir


def test_unimp_task_script(trained_run):
    run = os.path.join(trained_run, "unimp_beauty_rec")
    assert os.path.isdir(os.path.join(run, "final_weights"))
    assert any(f.startswith("unimp_beauty_rec_rec_test")
               for f in os.listdir(os.path.join(run, "results")))


def test_unimp_eval_script(synth_dir, trained_run):
    run_dir = trained_run
    _run(
        "unimp_eval.sh",
        ["debug", "beauty", "rec", "final_weights"],
        COMMON + [f"--external_save_dir={run_dir}",
                  "--load_run_name=unimp_beauty_rec", "--do_test"],
        synth_dir, run_dir,
    )
    res = os.path.join(run_dir, "unimp_beauty_rec", "eval_results.json")
    with open(res) as f:
        metrics = json.load(f)
    assert "rec" in metrics and "hr@10" in metrics["rec"]
