"""LSTM-aware rollout collection and evaluation (behavioral parity:
track_mjx/agent/lstm_ppo/acting.py).

- ``actor_step`` (:36-78): policy(obs, key, hidden) -> (action, extras,
  new_hidden); hidden resets to the wrapper-provided initial hidden on done;
  the LAGGED (h, c) pair is stored in transition extras; stop_gradient on the
  carried hidden.
- ``generate_unroll`` (:81-110) threads the hidden through the scan.
- ``Evaluator`` (:113-197) threads hidden through eval unrolls.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.acting import EvalWrapper
from track_mjx_tpu.envs.base import Env, State


def actor_step(
    env: Env,
    env_state: State,
    policy,
    key: types.PRNGKey,
    hidden_state: Tuple[jnp.ndarray, jnp.ndarray],
    extra_fields: Sequence[str] = (),
):
    """One policy+env step with hidden-state bookkeeping."""
    actions, policy_extras, new_hidden_state = policy(
        env_state.obs, key, hidden_state
    )
    info_hidden = env_state.info["hidden_state"]
    nstate = env.step(env_state, actions)
    state_extras = {x: nstate.info[x] for x in extra_fields}
    done = nstate.done[:, None].reshape((nstate.done.shape[0], 1, 1))
    new_hidden_state = jax.tree.map(
        lambda info_h, h: jnp.where(done, info_h, h), info_hidden, new_hidden_state
    )
    new_hidden_state = jax.tree.map(jax.lax.stop_gradient, new_hidden_state)
    return (
        nstate,
        types.Transition(
            observation=env_state.obs,
            action=actions,
            reward=nstate.reward,
            discount=1 - nstate.done,
            next_observation=nstate.obs,
            extras={
                "policy_extras": policy_extras,
                "state_extras": state_extras,
                # lagged hidden: the state BEFORE this policy call
                "hidden_state": hidden_state[0],
                "cell_state": hidden_state[1],
            },
        ),
        new_hidden_state,
    )


def generate_unroll(
    env: Env,
    env_state: State,
    policy,
    key: types.PRNGKey,
    hidden_state: Tuple[jnp.ndarray, jnp.ndarray],
    unroll_length: int,
    extra_fields: Sequence[str] = (),
):
    """Collects [unroll_length] transitions, threading the LSTM hidden."""

    def f(carry, unused_t):
        state, current_key, hidden = carry
        current_key, next_key = jax.random.split(current_key)
        nstate, transition, new_hidden = actor_step(
            env, state, policy, current_key, hidden, extra_fields=extra_fields
        )
        return (nstate, next_key, new_hidden), transition

    (final_state, _, forward_hidden_state), data = jax.lax.scan(
        f, (env_state, key, hidden_state), (), length=unroll_length
    )
    return final_state, data, forward_hidden_state


class Evaluator:
    """Evaluator threading LSTM hidden state through the unroll."""

    def __init__(
        self,
        eval_env: Env,
        eval_policy_fn: Callable,
        num_eval_envs: int,
        episode_length: int,
        action_repeat: int,
        key: types.PRNGKey,
    ):
        self._key = key
        self._eval_walltime = 0.0

        eval_env = EvalWrapper(eval_env)

        def generate_eval_unroll(policy_params, key):
            reset_keys = jax.random.split(key, num_eval_envs)
            eval_first_state = eval_env.reset(reset_keys)
            dummy_hidden_state = eval_first_state.info["hidden_state"]
            final_state, _, final_hidden_state = generate_unroll(
                eval_env,
                eval_first_state,
                eval_policy_fn(policy_params),
                key,
                dummy_hidden_state,
                unroll_length=episode_length // action_repeat,
            )
            return final_state, final_hidden_state

        self._generate_eval_unroll = jax.jit(generate_eval_unroll)
        self._steps_per_unroll = episode_length * num_eval_envs

    def run_evaluation(
        self,
        policy_params,
        training_metrics: types.Metrics,
        aggregate_episodes: bool = True,
        data_split: str = "",
    ) -> types.Metrics:
        """Runs one eval epoch (metric naming parity with the MLP evaluator)."""
        self._key, unroll_key = jax.random.split(self._key)
        t = time.time()
        eval_state, _hidden = self._generate_eval_unroll(policy_params, unroll_key)
        eval_metrics = eval_state.info["eval_metrics"]
        eval_metrics.active_episodes.block_until_ready()
        epoch_eval_time = time.time() - t
        metrics = {}
        prefix = f"{data_split}/" if data_split != "" else ""
        for fn in [np.mean, np.std]:
            suffix = "_std" if fn == np.std else ""
            metrics.update(
                {
                    f"eval/{prefix}episode_{name}{suffix}": (
                        fn(value) if aggregate_episodes else value
                    )
                    for name, value in eval_metrics.episode_metrics.items()
                }
            )
        metrics[f"eval/{prefix}avg_episode_length"] = np.mean(
            eval_metrics.episode_steps
        )
        metrics[f"eval/{prefix}epoch_eval_time"] = epoch_eval_time
        metrics[f"eval/{prefix}sps"] = self._steps_per_unroll / epoch_eval_time
        self._eval_walltime = self._eval_walltime + epoch_eval_time
        return {
            f"eval/{prefix}walltime": self._eval_walltime,
            **training_metrics,
            **metrics,
        }
