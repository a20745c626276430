"""Real multi-process coverage for evals.dist: two CPU JAX processes
gather different-length metric lists (exercising the padding branch of
gather_metric_lists) and average metrics across hosts — the reference's
accelerator.gather_for_metrics semantics (eval_search.py:150-155)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # e2e/training/subprocess: excluded from the quick lane

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=int(sys.argv[2]),
        process_id=int(sys.argv[3]),
    )
    from unimp_tpu.evals.dist import barrier, gather_metric_lists, mean_over_hosts

    pid = jax.process_index()
    vals = [float(pid)] * (2 + pid)  # lengths 2 and 3 -> padding path
    out = gather_metric_lists(vals)
    print("GATHERED", sorted(out.tolist()))
    m = mean_over_hosts({"x": float(pid)})
    print("MEAN", m["x"])
    barrier()
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_gather_metric_lists_two_processes(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process gather timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        # 2 zeros from rank 0 + 3 ones from rank 1, order-insensitive
        assert "GATHERED [0.0, 0.0, 1.0, 1.0, 1.0]" in out, out
        assert "MEAN 0.5" in out, out
