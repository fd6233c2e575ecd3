"""Long PPO learning run for curve sanity (BASELINE.md learning-curve rows).

Runs the MLP intention-PPO trainer at the reference minibatch structure
(batch 1024 x 16 minibatches x 4 updates, unroll 20 — reference:
track_mjx/config/rodent-full-clips.yaml:72-88 and fly-mc-intention.yaml:70-87)
on synthetic clips for tens of millions of env steps, under the production KL
ramp, and records the eval-reward / episode-length trajectory to a JSON file
for BASELINE.md.

Usage: python tools/long_run.py [--walker fly] [--num-timesteps 50e6]
       [--num-envs 4096] [--num-evals 16] [--out /tmp/long_run.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

import bench
from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
from track_mjx_tpu.agent.mlp_ppo import ppo_networks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walker", choices=("rodent", "fly"), default="rodent")
    ap.add_argument("--num-timesteps", type=float, default=50e6)
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--num-evals", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--num-minibatches", type=int, default=16)
    ap.add_argument("--updates-per-batch", type=int, default=4)
    ap.add_argument("--epoch-steps-per-call", type=int, default=2)
    ap.add_argument("--n-clips", type=int, default=4)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--out", type=str, default="/tmp/long_run.json")
    args = ap.parse_args()

    env, cfg = bench.build_env(args.n_clips, walker_type=args.walker)
    episode_length = int(
        (
            cfg.reference_config.clip_length
            - cfg.reference_config.random_init_range
            - cfg.reference_config.traj_length
        )
        * env._steps_for_cur_frame
    )
    print(f"episode_length={episode_length}", flush=True)

    factory = functools.partial(
        ppo_networks.make_intention_ppo_networks,
        intention_latent_size=cfg.network_config.intention_size,
        encoder_hidden_layer_sizes=tuple(cfg.network_config.encoder_layer_sizes),
        decoder_hidden_layer_sizes=tuple(cfg.network_config.decoder_layer_sizes),
        value_hidden_layer_sizes=tuple(cfg.network_config.critic_layer_sizes),
    )

    history = []
    t0 = time.time()

    def progress(step, metrics):
        rec = {
            "wall_s": round(time.time() - t0, 1),
            "env_steps_k": int(step),
            "eval_reward": _f(metrics.get("eval/episode_reward")),
            "eval_reward_std": _f(metrics.get("eval/episode_reward_std")),
            "avg_episode_length": _f(metrics.get("eval/avg_episode_length")),
            "training_sps": _f(metrics.get("training/sps")),
            "eval_sps": _f(metrics.get("eval/sps")),
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "w") as f:
            json.dump(history, f, indent=1)

    tc = cfg.train_setup.train_config
    mlp_ppo.train(
        environment=env,
        num_timesteps=int(args.num_timesteps),
        episode_length=episode_length,
        ckpt_mgr=None,
        config_dict={"network_config": {}, "env_config": {"render_interval": 10_000}},
        num_envs=args.num_envs,
        num_eval_envs=128,
        learning_rate=float(tc.learning_rate),
        entropy_cost=float(tc.entropy_cost),
        kl_weight=float(cfg.network_config.kl_weight),
        discounting=float(tc.discounting),
        seed=int(tc.seed if args.seed is None else args.seed),
        unroll_length=int(tc.unroll_length),
        batch_size=args.batch_size,
        num_minibatches=args.num_minibatches,
        num_updates_per_batch=args.updates_per_batch,
        num_evals=args.num_evals,
        normalize_observations=True,
        clipping_epsilon=float(tc.clipping_epsilon),
        use_lstm=False,
        deterministic_eval=True,
        network_factory=factory,
        progress_fn=progress,
        epoch_steps_per_call=args.epoch_steps_per_call,
    )
    rews = [h["eval_reward"] for h in history if h["eval_reward"] is not None]
    print(f"\nfirst={rews[0]:.2f} last={rews[-1]:.2f} max={max(rews):.2f}")


def _f(x):
    return float(x) if x is not None else None


if __name__ == "__main__":
    main()
