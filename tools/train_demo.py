"""Short end-to-end PPO learning demo on the rodent tracking task.

Trains on synthetic clips at reduced scale and prints the eval-reward
progression — the round-level check that the full loop (physics -> obs ->
reward -> PPO -> normalizer -> eval) actually learns on TPU.

Usage: python tools/train_demo.py [num_timesteps] [num_envs]
"""

from __future__ import annotations

import sys
import time

import jax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

import functools

from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
from track_mjx_tpu.agent.mlp_ppo import ppo_networks
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.task.tracking import MultiClipTracking
from track_mjx_tpu.envs.walker.rodent import Rodent
from track_mjx_tpu.io.synthetic import synthesize_clips
from track_mjx_tpu.utils.config import load_config


def main():
    num_timesteps = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    num_evals = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    cfg = load_config("rodent-full-clips")
    walker = Rodent(
        joint_names=cfg.walker_config.joint_names,
        body_names=cfg.walker_config.body_names,
        end_eff_names=cfg.walker_config.end_eff_names,
        torque_actuators=cfg.walker_config.torque_actuators,
        rescale_factor=cfg.walker_config.rescale_factor,
    )
    clips = synthesize_clips(walker._mj_model, n_clips=2, n_frames=250)
    rewards = dict(cfg.env_config.reward_weights)
    rewards["healthy_z_range"] = tuple(rewards["healthy_z_range"])
    env = MultiClipTracking(
        reference_clip=clips,
        walker=walker,
        reward_config=RewardConfig(**rewards),
        **dict(cfg.env_config.env_args),
        **dict(cfg.reference_config),
    )

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
        rew = metrics.get("eval/episode_reward")
        sps = metrics.get("training/sps", 0)
        history.append((step, float(rew) if rew is not None else None))
        print(
            f"[{time.time() - t0:7.1f}s] steps(k)={step} "
            f"eval/episode_reward={rew} training/sps={sps:,.0f}",
            flush=True,
        )

    make_policy, params, metrics = mlp_ppo.train(
        environment=env,
        num_timesteps=num_timesteps,
        episode_length=195,
        ckpt_mgr=None,
        config_dict={
            "network_config": {},
            "env_config": {"render_interval": 10_000},
        },
        num_envs=num_envs,
        num_eval_envs=128,
        learning_rate=1e-4,
        entropy_cost=1e-2,
        kl_weight=1e-1,
        discounting=0.98,
        seed=0,
        unroll_length=20,
        batch_size=256,
        num_minibatches=4,
        num_updates_per_batch=4,
        num_evals=num_evals,
        normalize_observations=True,
        clipping_epsilon=0.2,
        use_lstm=False,
        deterministic_eval=True,
        network_factory=factory,
        progress_fn=progress,
    )
    print("\nreward progression:")
    for step, rew in history:
        print(f"  steps(k)={step:>8} reward={rew}")
    first = next((r for _, r in history if r is not None), None)
    last = next((r for _, r in reversed(history) if r is not None), None)
    print(f"\nfirst={first:.2f} last={last:.2f} improvement={last - first:+.2f}")


if __name__ == "__main__":
    main()
