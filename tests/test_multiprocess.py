"""Multi-process data parallelism: 2 JAX processes x 4 virtual CPU devices.

Proves the trainer's multi-host path actually executes (SURVEY.md section 2c
"Multi-host DP"; reference designs for it via jax.process_count/
synchronize_hosts, track_mjx/agent/mlp_ppo/ppo.py:242-257,805-808, but has no
test). Each worker initializes jax.distributed against a shared coordinator,
forms the global 8-device mesh, and runs a tiny MLP PPO training; the test
asserts both processes finish, see identical final parameters (multi-host
replication invariant), and produce finite learner state.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(_HERE)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [_REPO, _HERE, env.get("PYTHONPATH", "")]
    )
    # the workers force CPU themselves; scrub any ambient platform pin
    env.pop("JAX_PLATFORMS", None)

    workers = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(_HERE, "multiprocess_worker.py"),
                str(i),
                "2",
                str(port),
                str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for w in workers:
        try:
            out, _ = w.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            raise
        outs.append(out)
    for i, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for i in range(2):
        with open(tmp_path / f"worker_{i}.json") as f:
            results[i] = json.load(f)

    for i in range(2):
        assert results[i]["device_count"] == 8
        assert results[i]["finite"], f"worker {i} non-finite params"
        assert results[i]["n_params"] > 0

    # multi-host replication: both processes must hold identical final params
    assert results[0]["n_params"] == results[1]["n_params"]
    assert results[0]["param_sum"] == pytest.approx(
        results[1]["param_sum"], rel=0, abs=0
    ), "final params differ across processes"
    assert results[0]["param_l2"] == pytest.approx(
        results[1]["param_l2"], rel=0, abs=0
    )
