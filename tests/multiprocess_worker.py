"""Worker process for the multi-process data-parallel test.

Launched by tests/test_multiprocess.py: each worker is one JAX process with 4
virtual CPU devices; together they form the 8-device global mesh the rest of
the suite uses single-process. Exercises the trainer's multi-host code paths
(jax.distributed.initialize, global-array sharding across processes,
XLA-inserted cross-process collectives, process-0 eval/ckpt gating,
synchronize_hosts — reference parity: track_mjx/agent/mlp_ppo/ppo.py:242-257,
805-808).

Usage: python multiprocess_worker.py <proc_id> <num_procs> <port> <outdir>
"""

import json
import os
import sys


def main():
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    # replace (don't just append) any inherited device-count flag: the
    # launching pytest process carries =8 from tests/conftest.py
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * num_procs, jax.device_count()

    import numpy as np

    from helpers import make_toy_env
    from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
    from track_mjx_tpu.agent.mlp_ppo import ppo_networks

    def factory(*args, **kwargs):
        kwargs.update(
            intention_latent_size=8,
            encoder_hidden_layer_sizes=(32,),
            decoder_hidden_layer_sizes=(32,),
            value_hidden_layer_sizes=(32,),
        )
        return ppo_networks.make_intention_ppo_networks(*args, **kwargs)

    env = make_toy_env()
    progress = []
    make_policy, params, metrics = mlp_ppo.train(
        environment=env,
        num_timesteps=256,
        episode_length=16,
        ckpt_mgr=None,
        config_dict={"network_config": {}, "env_config": {"render_interval": 10}},
        num_envs=8,
        num_eval_envs=4,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        kl_weight=1e-2,
        discounting=0.97,
        seed=0,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
        use_lstm=False,
        deterministic_eval=True,
        network_factory=factory,
        progress_fn=lambda step, m: progress.append(step),
    )

    # every process dumps its view of the final policy params; the test
    # asserts cross-process equality (the multi-host analogue of
    # assert_is_replicated) and compares against a single-process run
    leaves = jax.tree.leaves(params)
    flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
    out = {
        "process_id": proc_id,
        "device_count": jax.device_count(),
        "param_sum": float(flat.sum()),
        "param_l2": float(np.linalg.norm(flat)),
        "n_params": int(flat.size),
        "finite": bool(np.isfinite(flat).all()),
        "progress_steps": progress,
        "eval_reward": float(metrics.get("eval/episode_reward", float("nan"))),
    }
    with open(os.path.join(outdir, f"worker_{proc_id}.json"), "w") as f:
        json.dump(out, f)
    print(f"worker {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
