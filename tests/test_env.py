"""Tracking-env behavior tests (toy walker for speed): reset/step contracts,
frame indexing, ring buffer, termination, NaN guard, wrapper semantics."""

import jax
import jax.numpy as jp
import numpy as np
import pytest

from helpers import make_toy_env
from track_mjx_tpu.envs import wrappers


@pytest.fixture(scope="module")
def toy_env():
    return make_toy_env()


@pytest.fixture(scope="module")
def reset_state(toy_env):
    return jax.jit(toy_env.reset)(jax.random.PRNGKey(0))


class TestReset:
    def test_obs_sizes_published(self, toy_env, reset_state):
        info = reset_state.info
        assert info["reference_obs_size"] > 0
        assert info["proprioceptive_obs_size"] > 0
        assert (
            reset_state.obs.shape[-1]
            == info["reference_obs_size"] + info["proprioceptive_obs_size"]
        )

    def test_metrics_dict(self, reset_state):
        # the exact 20-key metric contract (reference :176-197)
        expected = {
            "pos_reward", "quat_reward", "joint_reward", "angvel_reward",
            "bodypos_reward", "endeff_reward", "ctrl_cost", "ctrl_diff_cost",
            "energy_cost", "done", "too_far", "bad_pose", "bad_quat", "fall",
            "nan", "joint_distance", "summed_pos_distance", "quat_distance",
            "var_cost", "jerk_cost",
        }
        assert set(reset_state.metrics.keys()) == expected

    def test_action_buffer_initialized(self, toy_env, reset_state):
        buf = reset_state.info["action_buffer"]
        assert buf.shape == (
            toy_env._reward_config.var_window_size,
            toy_env.plan.nu,
        )
        assert (np.asarray(buf) == 0).all()
        assert int(reset_state.info["buffer_index"]) == 0

    def test_reset_near_reference(self, toy_env, reset_state):
        """qpos should be the reference frame plus <= noise_scale noise."""
        info = reset_state.info
        ref = jax.tree.map(
            lambda x: x[info["start_frame"]],
            toy_env._get_reference_clip(info),
        )
        new_qpos = jp.concatenate([ref.position, ref.quaternion, ref.joints])
        err = np.abs(np.asarray(reset_state.pipeline_state.qpos - new_qpos))
        assert err.max() <= toy_env._reset_noise_scale + 1e-6

    def test_multiclip_start_frame_range(self, toy_env):
        keys = jax.vmap(jax.random.PRNGKey)(jp.arange(16))
        batched = jax.jit(jax.vmap(toy_env.reset))(keys)
        starts = [int(x) for x in batched.info["start_frame"]]
        clips = [int(x) for x in batched.info["clip_idx"]]
        # reference hard-codes randint(0, 44) (multi_clip_tracking.py:87)
        assert min(starts) >= 0 and max(starts) < 44
        assert set(clips) <= set(range(toy_env._n_clips))


class TestStep:
    def test_step_advances_time_and_frame(self, toy_env, reset_state):
        step = jax.jit(toy_env.step)
        state = reset_state
        f0 = int(toy_env._get_cur_frame(state.info, state.pipeline_state))
        for _ in range(4):
            state = step(state, jp.zeros(toy_env.action_size))
        f1 = int(toy_env._get_cur_frame(state.info, state.pipeline_state))
        dt = toy_env._mj_model.opt.timestep * toy_env._n_frames
        assert float(state.pipeline_state.time) == pytest.approx(4 * dt, rel=1e-5)
        expected_frames = int(np.floor(4 * dt * toy_env._mocap_hz))
        assert f1 - f0 == expected_frames

    def test_ring_buffer_update(self, toy_env, reset_state):
        step = jax.jit(toy_env.step)
        a = jp.ones(toy_env.action_size) * 0.5
        state = step(reset_state, a)
        assert int(state.info["buffer_index"]) == 1
        np.testing.assert_allclose(
            np.asarray(state.info["action_buffer"][0]), 0.5, rtol=1e-6
        )
        assert np.asarray(state.info["prev_ctrl"] == a).all()

    def test_jerk_cost_matches_rotation_form(self):
        """The static-roll jerk cost must equal the reference's
        buffer-doubling rotation (track_mjx reward.py:333-356) at every
        ring position, including the wrap-around ones."""
        from track_mjx_tpu.envs.task.reward import compute_jerk_cost

        rng = np.random.RandomState(3)
        w, nu = 7, 5
        buffer = rng.randn(w, nu).astype(np.float32)
        for idx in range(w):
            got = float(
                compute_jerk_cost(
                    {"action_buffer": jp.array(buffer), "buffer_index": idx},
                    w,
                    0.25,
                )
            )
            doubled = np.concatenate([buffer, buffer], axis=0)
            ordered = doubled[idx : idx + w]
            jerks = ordered[2:] - 2 * ordered[1:-1] + ordered[:-2]
            want = 0.25 * float(np.sum(jerks**2))
            assert got == pytest.approx(want, rel=1e-5), idx

    def test_ring_buffer_vmap_positions(self, toy_env, reset_state):
        """The one-hot ring write must land each action in its own slot
        when buffer indices differ across the batch (the vmap case the
        scatter rewrite must preserve)."""
        batched = jax.vmap(lambda s, a: toy_env.step(s, a).info["action_buffer"])
        n = 3
        states = jax.tree.map(lambda x: jp.stack([x] * n), reset_state)
        # stagger the ring positions across envs
        states.info["buffer_index"] = jp.arange(n)
        acts = jp.stack(
            [jp.full(toy_env.action_size, 0.1 * (i + 1)) for i in range(n)]
        )
        bufs = np.asarray(jax.jit(batched)(states, acts))
        for i in range(n):
            np.testing.assert_allclose(bufs[i, i], 0.1 * (i + 1), rtol=1e-6)
            np.testing.assert_allclose(
                np.delete(bufs[i], i, axis=0), 0.0, atol=1e-7
            )

    def test_reward_finite_and_metrics_update(self, toy_env, reset_state):
        step = jax.jit(toy_env.step)
        state = step(reset_state, jp.zeros(toy_env.action_size))
        assert np.isfinite(float(state.reward))
        assert float(state.metrics["pos_reward"]) > 0
        assert np.isfinite(np.asarray(state.obs)).all()

    def test_total_reward_composition(self, toy_env, reset_state):
        step = jax.jit(toy_env.step)
        state = step(reset_state, jp.ones(toy_env.action_size) * 0.3)
        m = state.metrics
        total = (
            m["pos_reward"] + m["quat_reward"] + m["joint_reward"]
            + m["angvel_reward"] + m["bodypos_reward"] + m["endeff_reward"]
            + m["ctrl_cost"] + m["ctrl_diff_cost"] + m["energy_cost"]
            + m["var_cost"] + m["jerk_cost"]
        )  # costs are stored negated in metrics
        assert float(total) == pytest.approx(float(state.reward), rel=1e-4)

    def test_nan_guard(self, toy_env, reset_state):
        """NaN in the pipeline state must force done=1 and sanitize outputs."""
        bad = reset_state.replace(
            pipeline_state=reset_state.pipeline_state.replace(
                qvel=reset_state.pipeline_state.qvel.at[0].set(jp.nan)
            )
        )
        state = jax.jit(toy_env.step)(bad, jp.zeros(toy_env.action_size))
        assert float(state.done) == 1.0
        assert float(state.metrics["nan"]) == 1.0
        assert np.isfinite(np.asarray(state.obs)).all()
        assert np.isfinite(float(state.reward))


class TestWrappers:
    def test_episode_and_autoreset(self, toy_env):
        env = wrappers.EpisodeWrapper(toy_env, episode_length=3, action_repeat=1)
        env = wrappers.VmapWrapper(env)
        env = wrappers.AutoResetWrapperTracking(env)
        rng = jax.random.split(jax.random.PRNGKey(1), 4)
        state = jax.jit(env.reset)(rng)
        first_qpos = np.asarray(state.pipeline_state.qpos)
        step = jax.jit(env.step)
        a = jp.zeros((4, toy_env.action_size))
        for _ in range(3):
            state = step(state, a)
        # after 3 steps all envs truncate -> done, and the SAME step already
        # swapped the cached first state back in (reference wrappers.py:288-310)
        assert np.asarray(state.done).all()
        np.testing.assert_allclose(
            np.asarray(state.pipeline_state.qpos), first_qpos, rtol=1e-5
        )
        # steps counter is zeroed lazily at the START of the next step
        # (reference wrappers.py:289-292), so it still reads 3 here
        assert np.asarray(state.info["steps"] == 3).all()

    def test_lstm_autoreset_hidden_shapes(self, toy_env):
        env = wrappers.EpisodeWrapper(toy_env, episode_length=5, action_repeat=1)
        env = wrappers.VmapWrapper(env)
        env = wrappers.LSTMAutoResetWrapperTracking(
            env, lstm_features=16, hidden_layer_num=2
        )
        rng = jax.random.split(jax.random.PRNGKey(2), 3)
        state = jax.jit(env.reset)(rng)
        h, c = state.info["hidden_state"]
        assert h.shape == (3, 2, 16) and c.shape == (3, 2, 16)

    def test_eval_clip_wrapper_no_noise(self, toy_env):
        env = wrappers.EvalClipWrapperTracking(toy_env)
        state = jax.jit(env.reset)(jax.random.PRNGKey(3))
        info = state.info
        assert int(info["start_frame"]) == 0
        ref = jax.tree.map(
            lambda x: x[0], toy_env._get_reference_clip(info)
        )
        new_qpos = jp.concatenate([ref.position, ref.quaternion, ref.joints])
        qvel = np.asarray(state.pipeline_state.qvel)
        # noise=False only gates the qvel noise; qpos noise is unconditional
        # (reference single_clip_tracking.py:153-161)
        err = np.abs(np.asarray(state.pipeline_state.qpos) - np.asarray(new_qpos))
        assert err.max() <= toy_env._reset_noise_scale + 1e-6
        np.testing.assert_allclose(qvel, 0.0, atol=1e-7)

    def test_render_rollout_wrapper(self, toy_env):
        env = wrappers.RenderRolloutWrapperMulticlipTracking(toy_env)
        state = jax.jit(env.reset, static_argnums=1)(jax.random.PRNGKey(4), 1)
        assert int(state.info["clip_idx"]) == 1
        assert int(state.info["start_frame"]) == 0


class TestDomainRandomization:
    def test_randomized_vmap_wrapper(self, toy_env):
        """Per-env randomized Model leaves through DomainRandomizationVmapWrapper."""
        import jax as _jax
        from track_mjx_tpu.physics.model import Model

        n_envs = 3
        base_model = toy_env.model

        def randomization_fn(model):
            # randomize floor friction per env; all other leaves shared
            frictions = jp.stack(
                [
                    model.geom_friction.at[0, 0].set(0.5 + 0.1 * i)
                    for i in range(n_envs)
                ]
            )
            model_v = model.replace(geom_friction=frictions)
            in_axes = _jax.tree.map(lambda _: None, model)
            in_axes = in_axes.replace(geom_friction=0)
            return model_v, in_axes

        env = wrappers.EpisodeWrapper(toy_env, episode_length=5, action_repeat=1)
        env = wrappers.DomainRandomizationVmapWrapper(env, randomization_fn)
        rng = jax.random.split(jax.random.PRNGKey(0), n_envs)
        state = jax.jit(env.reset)(rng)
        state = jax.jit(env.step)(state, jp.zeros((n_envs, toy_env.action_size)))
        assert np.isfinite(np.asarray(state.obs)).all()
        # restore the unrandomized model for other tests
        toy_env.model = base_model


class TestFusedClipIndexing:
    """The packed single-gather reference access must match naive
    clip-then-frame tree indexing exactly on every step-consumed field
    (it replaces per-field gathers — and, before that, a whole-clip
    materialization per env per step — see SingleClipTracking._unpack).
    body_quaternions is reconstructed as zeros (never consumed after io)."""

    PACKED = (
        "position",
        "quaternion",
        "joints",
        "velocity",
        "angular_velocity",
        "joints_velocity",
        "body_positions",
    )

    def _assert_matches(self, fused, naive):
        for name in self.PACKED:
            np.testing.assert_array_equal(
                np.asarray(getattr(fused, name)),
                np.asarray(getattr(naive, name)),
                err_msg=name,
            )
        assert not np.asarray(fused.body_quaternions).any()

    def test_reference_frame_matches_naive(self, toy_env):
        clips = toy_env._reference_clips
        F = toy_env._clip_frames
        for clip_idx, frame in [(0, 0), (0, 3), (1, 7), (1, F - 1), (0, F + 5)]:
            info = {"clip_idx": jp.array(clip_idx)}
            fused = toy_env._get_reference_frame_at(info, jp.array(frame))
            naive = jax.tree.map(
                lambda x: x[clip_idx][min(frame, F - 1)] if x.ndim >= 2 else x[clip_idx],
                clips,
            )
            self._assert_matches(fused, naive)

    def test_reference_trajectory_matches_naive(self, toy_env):
        clips = toy_env._reference_clips
        F, L = toy_env._clip_frames, toy_env._ref_len

        class _D:
            time = jp.array(0.0)

        for clip_idx, cur in [(0, 0), (1, 4), (0, F - 2), (1, F + 3)]:
            info = {"clip_idx": jp.array(clip_idx), "start_frame": jp.array(cur)}
            fused = toy_env._get_reference_trajectory(info, _D())
            start = int(np.clip(cur + 1, 0, F - L))
            naive = jax.tree.map(
                lambda x: x[clip_idx][start : start + L]
                if x.ndim >= 2
                else jp.array([]),
                clips,
            )
            self._assert_matches(fused, naive)

    def test_step_reference_matches_parts(self, toy_env):
        """The single fused (1+L)-row gather must equal the separate
        frame/trajectory accessors."""

        class _D:
            time = jp.array(0.0)

        info = {"clip_idx": jp.array(1), "start_frame": jp.array(4)}
        frame, traj = toy_env._get_step_reference(info, _D())
        want_frame = toy_env._get_reference_frame_at(info, jp.array(4))
        want_traj = toy_env._get_reference_trajectory(info, _D())
        self._assert_matches(frame, want_frame)
        self._assert_matches(traj, want_traj)
