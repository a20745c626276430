"""True multi-process coverage for evals/dist.py.

The reference's cross-rank metric gathers (accelerator.gather,
eval_search.py:150-155) only ever run under a real multi-process launch;
here two actual Python processes form a 2-process JAX CPU cluster via
jax.distributed.initialize and exercise gather_metric_lists (uneven
per-host lengths), mean_over_hosts, and barrier.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep the remote TPU out
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
from unimp_tpu.evals.dist import barrier, gather_metric_lists, mean_over_hosts

# uneven per-host lists exercise the padding path
vals = [1.0, 2.0, 3.0] if pid == 0 else [4.0, 5.0]
gathered = gather_metric_lists(vals)
means = mean_over_hosts({"hr": 1.0 if pid == 0 else 3.0, "n": float(pid)})
barrier("test")
print("RESULT " + json.dumps(
    {"pid": pid, "gathered": sorted(gathered.tolist()), "means": means}
))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_metric_gather(tmp_path):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        res = json.loads(line[len("RESULT "):])
        assert res["gathered"] == [1.0, 2.0, 3.0, 4.0, 5.0]
        assert res["means"]["hr"] == 2.0
        assert res["means"]["n"] == 0.5
