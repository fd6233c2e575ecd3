"""Rollout collection and evaluation (replaces brax.training.acting,
SURVEY.md 2b; includes the reference's data_split-aware evaluator —
track_mjx/agent/mlp_ppo/ppo.py:83-124 monkey-patch, built in here)."""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import jax
import numpy as np
from flax import struct
from jax import numpy as jp

from track_mjx_tpu.agent import types
from track_mjx_tpu.envs.base import Env, State, Wrapper


def _record(
    env_state: State,
    nstate: State,
    actions: jax.Array,
    policy_extras: dict,
    extra_fields: Sequence[str],
    carry_extras: dict | None = None,
) -> types.Transition:
    """Builds the Transition for one step (shared by the feedforward and
    recurrent actors)."""
    extras = {
        "policy_extras": policy_extras,
        "state_extras": {x: nstate.info[x] for x in extra_fields},
    }
    if carry_extras:
        extras.update(carry_extras)
    return types.Transition(
        observation=env_state.obs,
        action=actions,
        reward=nstate.reward,
        discount=1 - nstate.done,
        next_observation=nstate.obs,
        extras=extras,
    )


def actor_step(
    env: Env,
    env_state: State,
    policy: types.Policy,
    key: types.PRNGKey,
    extra_fields: Sequence[str] = (),
) -> Tuple[State, types.Transition]:
    """One policy+env step, emitting a Transition."""
    actions, policy_extras = policy(env_state.obs, key)
    nstate = env.step(env_state, actions)
    return nstate, _record(env_state, nstate, actions, policy_extras, extra_fields)


def recurrent_actor_step(
    env: Env,
    env_state: State,
    policy,
    key: types.PRNGKey,
    carry,
    extra_fields: Sequence[str] = (),
):
    """One step of a recurrent policy: policy(obs, key, carry) ->
    (action, extras, carry').

    Carry semantics (reference parity, track_mjx/agent/lstm_ppo/acting.py:
    36-78): the transition records the PRE-step carry — the loss's BPTT
    re-unroll starts each stored sequence from the hidden that actually
    produced its first action. Wherever this step ended an episode, the
    outgoing carry is re-seeded from the wrapper's per-env initial hidden
    (info["hidden_state"], LSTMAutoResetWrapperTracking), and the whole
    carry is detached: gradients flow only through the loss's own re-unroll,
    never across rollout steps."""
    actions, policy_extras, carry_out = policy(env_state.obs, key, carry)
    reseed_carry = env_state.info["hidden_state"]
    nstate = env.step(env_state, actions)
    transition = _record(
        env_state,
        nstate,
        actions,
        policy_extras,
        extra_fields,
        {"hidden_state": carry[0], "cell_state": carry[1]},
    )

    def pick(init, live):
        done = nstate.done.reshape(nstate.done.shape + (1,) * (live.ndim - 1))
        return jax.lax.stop_gradient(jp.where(done, init, live))

    return nstate, transition, jax.tree.map(pick, reseed_carry, carry_out)


def generate_unroll(
    env: Env,
    env_state: State,
    policy: types.Policy,
    key: types.PRNGKey,
    unroll_length: int,
    extra_fields: Sequence[str] = (),
) -> Tuple[State, types.Transition]:
    """Collects [unroll_length] transitions under lax.scan."""

    def f(carry, unused_t):
        state, current_key = carry
        current_key, next_key = jax.random.split(current_key)
        nstate, transition = actor_step(
            env, state, policy, current_key, extra_fields=extra_fields
        )
        return (nstate, next_key), transition

    (final_state, _), data = jax.lax.scan(
        f, (env_state, key), (), length=unroll_length
    )
    return final_state, data


def recurrent_generate_unroll(
    env: Env,
    env_state: State,
    policy,
    key: types.PRNGKey,
    carry,
    unroll_length: int,
    extra_fields: Sequence[str] = (),
):
    """generate_unroll for a recurrent policy; also returns the post-unroll
    carry (the trainer threads it into the next rollout)."""

    def f(scan_carry, unused_t):
        state, current_key, policy_carry = scan_carry
        current_key, next_key = jax.random.split(current_key)
        nstate, transition, next_carry = recurrent_actor_step(
            env, state, policy, current_key, policy_carry,
            extra_fields=extra_fields,
        )
        return (nstate, next_key, next_carry), transition

    (final_state, _, final_carry), data = jax.lax.scan(
        f, (env_state, key, carry), (), length=unroll_length
    )
    return final_state, data, final_carry


@struct.dataclass
class EvalMetrics:
    """Episode-accumulated eval metrics (brax EvalWrapper parity)."""

    episode_metrics: dict
    active_episodes: jax.Array
    episode_steps: jax.Array


class EvalWrapper(Wrapper):
    """Accumulates per-episode metrics during eval unrolls."""

    def reset(self, rng: jax.Array) -> State:
        reset_state = self.env.reset(rng)
        reset_state.metrics["reward"] = reset_state.reward
        eval_metrics = EvalMetrics(
            episode_metrics=jax.tree.map(jp.zeros_like, reset_state.metrics),
            active_episodes=jp.ones_like(reset_state.reward),
            episode_steps=jp.zeros_like(reset_state.reward),
        )
        reset_state.info["eval_metrics"] = eval_metrics
        return reset_state

    def step(self, state: State, action: jax.Array) -> State:
        state_metrics = state.info["eval_metrics"]
        if not isinstance(state_metrics, EvalMetrics):
            raise ValueError(f"Incorrect type for state_metrics: {type(state_metrics)}")
        del state.info["eval_metrics"]
        nstate = self.env.step(state, action)
        nstate.metrics["reward"] = nstate.reward
        episode_steps = jp.where(
            state_metrics.active_episodes,
            nstate.info["steps"],
            state_metrics.episode_steps,
        )
        # Sanitize each step's contribution: the env's NaN guard covers only
        # reward/obs (reference parity, single_clip_tracking.py:287-293), so
        # a physics blow-up leaves NaN/inf in the TERM metrics for the step
        # on which done is forced — one poisoned step would otherwise turn
        # the whole eval/episode_* aggregate NaN (diagnosed round 4; the
        # `nan` metric still records the event itself).
        episode_metrics = jax.tree.map(
            lambda a, b: a
            + jp.nan_to_num(b, nan=0.0, posinf=0.0, neginf=0.0)
            * state_metrics.active_episodes,
            state_metrics.episode_metrics,
            nstate.metrics,
        )
        active_episodes = state_metrics.active_episodes * (1 - nstate.done)
        eval_metrics = EvalMetrics(
            episode_metrics=episode_metrics,
            active_episodes=active_episodes,
            episode_steps=episode_steps,
        )
        nstate.info["eval_metrics"] = eval_metrics
        return nstate


class Evaluator:
    """Deterministic-policy evaluator with data-split metric prefixes.

    With recurrent=True the policy signature is (obs, key, carry) ->
    (action, extras, carry') and each eval unroll threads the wrapper's
    initial hidden (replaces the reference's separate LSTM Evaluator fork,
    track_mjx/agent/lstm_ppo/acting.py:113-197)."""

    def __init__(
        self,
        eval_env: Env,
        eval_policy_fn: Callable[[types.PolicyParams], types.Policy],
        num_eval_envs: int,
        episode_length: int,
        action_repeat: int,
        key: types.PRNGKey,
        recurrent: bool = False,
    ):
        self._key = key
        self._eval_walltime = 0.0

        eval_env = EvalWrapper(eval_env)

        def generate_eval_unroll(
            policy_params: types.PolicyParams, key: types.PRNGKey
        ) -> State:
            reset_keys = jax.random.split(key, num_eval_envs)
            eval_first_state = eval_env.reset(reset_keys)
            policy = eval_policy_fn(policy_params)
            length = episode_length // action_repeat
            if recurrent:
                return recurrent_generate_unroll(
                    eval_env,
                    eval_first_state,
                    policy,
                    key,
                    eval_first_state.info["hidden_state"],
                    unroll_length=length,
                )[0]
            return generate_unroll(
                eval_env,
                eval_first_state,
                policy,
                key,
                unroll_length=length,
            )[0]

        self._generate_eval_unroll = jax.jit(generate_eval_unroll)
        self._steps_per_unroll = episode_length * num_eval_envs

    def run_evaluation(
        self,
        policy_params: types.PolicyParams,
        training_metrics: types.Metrics,
        aggregate_episodes: bool = True,
        data_split: str = "",
    ) -> types.Metrics:
        """Runs one eval epoch; metric keys get 'eval/{data_split}/' prefixes
        (reference run_evaluation parity, mlp_ppo/ppo.py:83-120)."""
        self._key, unroll_key = jax.random.split(self._key)
        t = time.time()
        eval_state = self._generate_eval_unroll(policy_params, unroll_key)
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
        metrics = {
            f"eval/{prefix}walltime": self._eval_walltime,
            **training_metrics,
            **metrics,
        }
        return metrics
