"""Vectorization / episode / auto-reset wrappers.

Behavioral parity with the reference wrapper stack
(track_mjx/environment/wrappers.py) plus the brax training wrappers it
imports (EpisodeWrapper, VmapWrapper, DomainRandomizationVmapWrapper —
SURVEY.md section 2b), re-implemented on this framework's Env/State types:

- ``wrap()`` composes Episode -> Vmap -> AutoReset (LSTM or plain)
  (wrappers.py:18-56).
- ``AutoResetWrapperTracking`` caches the first pipeline_state/obs/prev_ctrl
  at reset and swaps them back per-env on done (wrappers.py:278-310) — the
  cheap state-swap auto-reset that keeps the whole epoch inside one jit.
- ``LSTMAutoResetWrapperTracking`` additionally initializes per-env (h, c)
  stacks [num_envs, num_layers, hidden] with a fixed PRNGKey(0)
  (wrappers.py:59-144).
- Render/eval wrappers reset to frame 0 (wrappers.py:147-274,313-325).
- ``AutoAlignWrapperTracking`` teleports qpos/qvel to the current reference
  frame and re-runs kinematics instead of restarting (wrappers.py:328-381).
- ``HighLevelWrapper`` folds a frozen decoder into the env so steps take
  latent intentions as actions (wrappers.py:384-412).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax import numpy as jp

from track_mjx_tpu.envs.base import Env, State, Wrapper
from track_mjx_tpu.physics import forward as phys_forward
from track_mjx_tpu.physics import kinematics as phys_kinematics


def wrap(
    env: Env,
    episode_length: int = 1000,
    action_repeat: int = 1,
    randomization_fn: Optional[Callable] = None,
    use_lstm: bool = True,
    hidden_state_dim: int = 128,
    hidden_layer_num: int = 2,
) -> Wrapper:
    """Standard training wrapper composition (reference wrappers.py:18-56)."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    if randomization_fn is None:
        env = VmapWrapper(env)
    else:
        env = DomainRandomizationVmapWrapper(env, randomization_fn)
    if use_lstm:
        env = LSTMAutoResetWrapperTracking(
            env, lstm_features=hidden_state_dim, hidden_layer_num=hidden_layer_num
        )
    else:
        env = AutoResetWrapperTracking(env)
    return env


class EpisodeWrapper(Wrapper):
    """Maintains episode step count and truncation (brax parity)."""

    def __init__(self, env: Env, episode_length: int, action_repeat: int):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        state.info["steps"] = jp.zeros(rng.shape[:-1])
        state.info["truncation"] = jp.zeros(rng.shape[:-1])
        return state

    def step(self, state: State, action: jax.Array) -> State:
        # keep the scan carry type stable: when the outer auto-reset wrapper
        # carries SlimData, the env's full-Data output is slimmed back
        slim_in = isinstance(state.pipeline_state, phys_forward.SlimData)

        def f(state, _):
            nstate = self.env.step(state, action)
            if slim_in:
                nstate = nstate.replace(
                    pipeline_state=phys_forward.slim_data(nstate.pipeline_state)
                )
            return nstate, nstate.reward

        state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
        state = state.replace(reward=jp.sum(rewards, axis=0))
        steps = state.info["steps"] + self.action_repeat
        one = jp.ones_like(state.done)
        zero = jp.zeros_like(state.done)
        episode_length = jp.array(self.episode_length, dtype=jp.int32)
        done = jp.where(steps >= episode_length, one, state.done)
        state.info["truncation"] = jp.where(
            steps >= episode_length, 1 - state.done, zero
        )
        state.info["steps"] = steps
        return state.replace(done=done)


class VmapWrapper(Wrapper):
    """Vectorizes the env over a batch of RNG keys (brax parity)."""

    def __init__(self, env: Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jax.Array) -> State:
        if self.batch_size is not None:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return jax.vmap(self.env.step)(state, action)


class DomainRandomizationVmapWrapper(Wrapper):
    """Vectorizes with per-env randomized physics Model leaves (brax parity).

    ``randomization_fn(model)`` returns (batched_model, in_axes) where in_axes
    marks which Model leaves carry a leading env axis."""

    def __init__(self, env: Env, randomization_fn: Callable):
        super().__init__(env)
        self._model_v, self._in_axes = randomization_fn(self.env.model)

    def _env_fn(self, model) -> Env:
        env = self.env
        env.unwrapped.model = model
        return env

    def reset(self, rng: jax.Array) -> State:
        def reset_fn(model, rng):
            env = self._env_fn(model)
            return env.reset(rng)

        return jax.vmap(reset_fn, in_axes=[self._in_axes, 0])(self._model_v, rng)

    def step(self, state: State, action: jax.Array) -> State:
        def step_fn(model, s, a):
            env = self._env_fn(model)
            return env.step(s, a)

        return jax.vmap(step_fn, in_axes=[self._in_axes, 0, 0])(
            self._model_v, state, action
        )


def _where_done(done: jax.Array, x, y):
    if done.shape:
        done = jp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
    return jp.where(done, x, y)


class AutoResetWrapperTracking(Wrapper):
    """Swap-based auto-reset for done envs (reference wrappers.py:278-310).

    TPU-first difference: the wrapped state (and the cached first state)
    carries only SlimData — {time,qpos,qvel,act,ctrl,qacc_warmstart} — not
    the full Data pytree. The env re-derives every other stage on the next
    step, so carrying them through the trainer's unroll scan (and keeping a
    second full copy as the reset cache) was pure HBM traffic: ~2x 70 MB per
    step at 1024 envs. Consumers of an auto-reset-wrapped state (trainers,
    evaluators, video logging) read obs/reward/metrics and pipeline_state
    qpos/qvel/time, all of which SlimData retains."""

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        slim = phys_forward.slim_data(state.pipeline_state)
        state.info["first_pipeline_state"] = slim
        state.info["first_obs"] = state.obs
        state.info["first_prev_ctrl"] = state.info["prev_ctrl"]
        return state.replace(pipeline_state=slim)

    def step(self, state: State, action: jax.Array) -> State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jp.where(state.done, jp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jp.zeros_like(state.done))
        state = self.env.step(state, action)
        done = state.done
        pipeline_state = jax.tree.map(
            lambda x, y: _where_done(done, x, y),
            state.info["first_pipeline_state"],
            phys_forward.slim_data(state.pipeline_state),
        )
        obs = _where_done(done, state.info["first_obs"], state.obs)
        state.info["prev_ctrl"] = _where_done(
            done, state.info["first_prev_ctrl"], state.info["prev_ctrl"]
        )
        return state.replace(pipeline_state=pipeline_state, obs=obs)


class AutoResetWrapper(Wrapper):
    """Generic state-swap auto-reset for NON-tracking envs: caches the first
    pipeline_state/obs at reset and swaps them back per env on done. The
    tracking variant additionally restores prev_ctrl; foreign envs have no
    such contract, so this is the whole behavior (brax AutoResetWrapper
    semantics)."""

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        state.info["first_pipeline_state"] = state.pipeline_state
        state.info["first_obs"] = state.obs
        return state

    def step(self, state: State, action: jax.Array) -> State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jp.where(state.done, jp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jp.zeros_like(state.done))
        state = self.env.step(state, action)
        done = state.done
        pipeline_state = jax.tree.map(
            lambda x, y: _where_done(done, x, y),
            state.info["first_pipeline_state"],
            state.pipeline_state,
        )
        obs = _where_done(done, state.info["first_obs"], state.obs)
        return state.replace(pipeline_state=pipeline_state, obs=obs)


class ExternalEnvAdapter(Env):
    """Duck-typing adapter for foreign envs (brax- / mujoco_playground-style:
    ``reset(rng) -> state`` with obs/reward/done/metrics[/info] fields and
    ``step(state, action)``), mapping their states onto this framework's
    ``State`` so the standard wrapper stack and trainers apply unchanged.

    Replaces the reference's mujoco_playground fallback
    (track_mjx/agent/mlp_ppo/ppo.py:462-466: non-brax envs are wrapped with
    ``mp_wrapper.wrap_for_brax_training``) without the dependency: any env
    exposing that surface trains through ``wrap_external``."""

    def __init__(self, env):
        self._env = env

    @property
    def action_size(self) -> int:
        return int(self._env.action_size)

    @property
    def unwrapped(self):
        return self._env

    def _to_state(self, s) -> State:
        if hasattr(s, "pipeline_state"):
            ps = s.pipeline_state
        else:  # mujoco_playground States carry `data`
            ps = getattr(s, "data", None)
        return State(
            pipeline_state=ps,
            obs=s.obs,
            reward=s.reward,
            done=s.done,
            metrics=dict(getattr(s, "metrics", {}) or {}),
            info=dict(getattr(s, "info", {}) or {}),
        )

    def reset(self, rng: jax.Array) -> State:
        foreign = self._env.reset(rng)
        state = self._to_state(foreign)
        state.info["_foreign_state"] = foreign
        return state

    def step(self, state: State, action: jax.Array) -> State:
        foreign = state.info["_foreign_state"]
        # write back the fields wrappers may have edited (done zeroing,
        # swapped pipeline state) before stepping the foreign env
        foreign = foreign.replace(done=state.done)
        if hasattr(foreign, "pipeline_state"):
            foreign = foreign.replace(pipeline_state=state.pipeline_state)
        elif hasattr(foreign, "data"):
            foreign = foreign.replace(data=state.pipeline_state)
        nforeign = self._env.step(foreign, action)
        nstate = self._to_state(nforeign)
        nstate.info.update(
            {k: v for k, v in state.info.items() if k not in nstate.info}
        )
        nstate.info["_foreign_state"] = nforeign
        return nstate


def wrap_external(
    env,
    episode_length: int = 1000,
    action_repeat: int = 1,
    randomization_fn: Optional[Callable] = None,
    **_unused,
) -> Wrapper:
    """wrap() for foreign (non-tracking) envs: Episode -> Vmap -> generic
    AutoReset over the ExternalEnvAdapter (reference fallback parity)."""
    env = ExternalEnvAdapter(env)
    env = EpisodeWrapper(env, episode_length, action_repeat)
    if randomization_fn is None:
        env = VmapWrapper(env)
    else:
        env = DomainRandomizationVmapWrapper(env, randomization_fn)
    return AutoResetWrapper(env)


def initialize_lstm_hidden(
    rng: jax.Array, num_envs: int, lstm_features: int, hidden_layer_num: int
) -> tuple[jp.ndarray, jp.ndarray]:
    """Zero-initialized per-env LSTM (h, c) stacks with the reference's shape
    contract [num_envs, num_layers, hidden]. The reference's initializer uses
    flax LSTMCell.initialize_carry which is zeros (wrappers.py:68-88)."""
    del rng
    shape = (num_envs, hidden_layer_num, lstm_features)
    return jp.zeros(shape), jp.zeros(shape)


class LSTMAutoResetWrapperTracking(Wrapper):
    """Auto-reset that also tracks per-env LSTM hidden state
    (reference wrappers.py:59-144)."""

    def __init__(self, env: Env, lstm_features: int = 128, hidden_layer_num: int = 2):
        super().__init__(env)
        self.lstm_features = lstm_features
        self.hidden_layer_num = hidden_layer_num

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        slim = phys_forward.slim_data(state.pipeline_state)
        state.info["first_pipeline_state"] = slim
        state.info["first_obs"] = state.obs
        state.info["first_prev_ctrl"] = state.info["prev_ctrl"]
        num_envs = state.obs.shape[0]
        # fixed PRNGKey(0) — reference parity (wrappers.py:99)
        state.info["hidden_state"] = initialize_lstm_hidden(
            jax.random.PRNGKey(0), num_envs, self.lstm_features, self.hidden_layer_num
        )
        return state.replace(pipeline_state=slim)

    def step(self, state: State, action: jax.Array) -> State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jp.where(state.done, jp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jp.zeros_like(state.done))
        state = self.env.step(state, action)
        done = state.done
        pipeline_state = jax.tree.map(
            lambda x, y: _where_done(done, x, y),
            state.info["first_pipeline_state"],
            phys_forward.slim_data(state.pipeline_state),
        )
        obs = _where_done(done, state.info["first_obs"], state.obs)
        state.info["prev_ctrl"] = _where_done(
            done, state.info["first_prev_ctrl"], state.info["prev_ctrl"]
        )
        return state.replace(pipeline_state=pipeline_state, obs=obs)


class RenderRolloutWrapperTrackingLSTM(Wrapper):
    """LSTM render wrapper: always resets to clip frame 0
    (reference wrappers.py:147-207)."""

    def __init__(self, env: Env, lstm_features: int = 128, hidden_layer_num: int = 2):
        super().__init__(env)
        self.lstm_features = lstm_features
        self.hidden_layer_num = hidden_layer_num

    def reset(self, rng: jax.Array, clip_idx: Optional[int] = None) -> State:
        _, clip_rng, rng = jax.random.split(rng, 3)
        if clip_idx is None:
            clip_idx = jax.random.randint(clip_rng, (), 0, self._n_clips)
        info = {
            "clip_idx": clip_idx,
            "start_frame": 0,
            "summed_pos_distance": 0.0,
            "quat_distance": 0.0,
            "joint_distance": 0.0,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
            "hidden_state": initialize_lstm_hidden(
                jax.random.PRNGKey(0), 1, self.lstm_features, self.hidden_layer_num
            ),
        }
        return self.reset_from_clip(rng, info)


class RenderRolloutVmapWrapper(Wrapper):
    """Vectorizes reset(rng, clip_idx)/step for batched render rollouts
    (reference wrappers.py:211-227, with its jnp NameError fixed)."""

    def __init__(self, env: Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jax.Array, clip_idx: Optional[jax.Array] = None) -> State:
        if self.batch_size is not None:
            rng = jax.random.split(rng, self.batch_size)
        if clip_idx is None:
            clip_idx = jp.zeros((rng.shape[0],), dtype=jp.int32)
        return jax.vmap(self.env.reset)(rng, clip_idx)

    def step(self, state: State, action: jax.Array) -> State:
        return jax.vmap(self.env.step)(state, action)


class RenderRolloutWrapperSingleclipTracking(Wrapper):
    """Single-clip render wrapper: resets to a fixed start frame
    (reference wrappers.py:230-248)."""

    def reset(self, rng: jax.Array, start_frame: int = 0) -> State:
        info = {
            "start_frame": start_frame,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
        }
        return self.reset_from_clip(rng, info)


class RenderRolloutWrapperMulticlipTracking(Wrapper):
    """Multi-clip render wrapper: frame 0, random or given clip
    (reference wrappers.py:251-274)."""

    def reset(self, rng: jax.Array, clip_idx: Optional[int] = None) -> State:
        _, clip_rng, rng = jax.random.split(rng, 3)
        if clip_idx is None:
            clip_idx = jax.random.randint(clip_rng, (), 0, self._n_clips)
        info = {
            "clip_idx": clip_idx,
            "start_frame": 0,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
        }
        return self.reset_from_clip(rng, info)


class EvalClipWrapperTracking(Wrapper):
    """Deterministic eval: frame 0 of a fixed clip, no reset noise
    (reference wrappers.py:313-325)."""

    def reset(self, rng: jax.Array, clip_idx=0) -> State:
        _, rng = jax.random.split(rng)
        info = {
            "clip_idx": clip_idx,
            "start_frame": 0,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
        }
        return self.reset_from_clip(rng, info, noise=False)


class AutoAlignWrapperTracking(Wrapper):
    """On done, teleports the pose to the current reference frame and re-runs
    kinematics instead of restarting (reference wrappers.py:328-381)."""

    def reset(self, rng: jax.Array, clip_idx: Optional[jax.Array] = None) -> State:
        return self.env.reset(rng, clip_idx)

    def step(self, state: State, action: jax.Array) -> State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jp.where(state.done, jp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jp.zeros_like(state.done))
        state = self.env.step(state, action)
        done = state.done

        ref = state.info["reference_frame"]
        new_qpos = jp.concatenate(
            (ref.position, ref.quaternion, ref.joints), axis=-1
        )
        new_qvel = jp.concatenate(
            (ref.velocity, ref.angular_velocity, ref.joints_velocity), axis=-1
        )
        aligned = state.pipeline_state.replace(qpos=new_qpos, qvel=new_qvel)
        aligned = jax.vmap(
            lambda d: phys_kinematics.kinematics(self.plan, self.model, d)
        )(aligned)
        pipeline_state = jax.tree.map(
            lambda x, y: _where_done(done, x, y), aligned, state.pipeline_state
        )
        reference_obs, proprioceptive_obs = jax.vmap(self._get_obs)(
            pipeline_state, state.info
        )
        obs = jp.concatenate([reference_obs, proprioceptive_obs], axis=-1)
        return state.replace(pipeline_state=pipeline_state, obs=obs)


class HighLevelWrapper(Wrapper):
    """Folds a frozen decoder into the env: actions are latent intentions
    (reference wrappers.py:384-412)."""

    def __init__(self, env: Env, decoder_inference_fn, reference_obs_size: int):
        self._decoder_inference_fn = decoder_inference_fn
        self._reference_obs_size = reference_obs_size
        super().__init__(env)

    def step(self, state: State, latents: jax.Array) -> State:
        obs = state.obs
        action, _ = self._decoder_inference_fn(
            jp.concatenate(
                [latents, obs[..., self._reference_obs_size :]], axis=-1
            )
        )
        return self.env.step(state, action)
