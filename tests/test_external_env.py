"""Foreign-env fallback: the MLP trainer must train a duck-typed non-tracking
env through wrappers.wrap_external (the reference's mujoco_playground
fallback, track_mjx/agent/mlp_ppo/ppo.py:462-466, rebuilt dependency-free)."""

import jax
import jax.numpy as jp
import numpy as np
import pytest
from flax import struct

pytestmark = pytest.mark.slow


@struct.dataclass
class _ForeignState:
    pipeline_state: jax.Array  # opaque to the framework
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: dict
    info: dict


class _PointMassEnv:
    """brax-style point mass: actions push a 2-D point toward the origin.
    Deliberately NOT a track_mjx_tpu Env subclass."""

    action_size = 2
    observation_size = 4

    def reset(self, rng):
        pos = jax.random.uniform(rng, (2,), minval=-0.5, maxval=0.5)
        vel = jp.zeros(2)
        obs = jp.concatenate([pos, vel])
        zero = jp.zeros(())
        return _ForeignState(
            pipeline_state=jp.concatenate([pos, vel]),
            obs=obs,
            reward=zero,
            done=zero,
            metrics={"reward": zero, "dist": jp.sum(jp.abs(pos))},
            info={},
        )

    def step(self, state, action):
        pos, vel = state.pipeline_state[:2], state.pipeline_state[2:]
        vel = 0.9 * vel + 0.1 * jp.tanh(action)
        pos = pos + 0.05 * vel
        dist = jp.linalg.norm(pos)
        reward = -dist
        done = jp.where(dist > 2.0, 1.0, 0.0)
        obs = jp.concatenate([pos, vel])
        return state.replace(
            pipeline_state=jp.concatenate([pos, vel]),
            obs=obs,
            reward=reward,
            done=done,
            metrics={"reward": reward, "dist": dist},
        )


def test_wrap_external_stack():
    from track_mjx_tpu.envs import wrappers

    env = wrappers.wrap_external(_PointMassEnv(), episode_length=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.jit(env.reset)(keys)
    assert state.obs.shape == (4, 4)
    step = jax.jit(env.step)
    for _ in range(10):  # runs past the episode boundary -> auto-reset
        state = step(state, jp.zeros((4, 2)))
    assert np.isfinite(np.asarray(state.obs)).all()
    assert "truncation" in state.info and "steps" in state.info


def test_mlp_trainer_on_foreign_env():
    from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
    from track_mjx_tpu.agent.mlp_ppo import ppo_networks as mlp_nets

    def factory(*args, **kwargs):
        kwargs.update(
            intention_latent_size=4,
            encoder_hidden_layer_sizes=(16,),
            decoder_hidden_layer_sizes=(16,),
            value_hidden_layer_sizes=(16,),
        )
        return mlp_nets.make_intention_ppo_networks(*args, **kwargs)

    _, params, metrics = mlp_ppo.train(
        environment=_PointMassEnv(),
        config_dict={"network_config": {}, "env_config": {"render_interval": 10}},
        num_timesteps=64,
        episode_length=8,
        ckpt_mgr=None,
        num_envs=8,
        num_eval_envs=4,
        seed=0,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
        use_lstm=False,
        network_factory=factory,
    )
    assert "training/sps" in metrics
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
