"""Single- and multi-clip motion-capture tracking environments.

Behavioral parity with the reference tasks (track_mjx/environment/task/
single_clip_tracking.py and multi_clip_tracking.py), re-hosted on the
framework's own physics engine instead of brax+mjx:

- ctor applies solver/iterations/ls_iterations/timestep to the MjModel before
  device packing (single_clip_tracking.py:65-72; jacobian is always dense in
  this engine);
- ``_steps_for_cur_frame = (1/(mocap_hz*dt))/physics_steps_per_control_step``
  (:81-83);
- ``reset_from_clip`` (:121-205): qpos = reference frame + uniform noise with
  the SAME rng key reused for the qvel noise (:153-160), metrics dict of 20
  keys (:176-197), action ring buffer + buffer_index in info (:200-203);
- ``step`` (:207-320): n physics substeps, frame indexing
  floor(time*mocap_hz)+start (:452-454), ring-buffer update, 18-output reward
  call, total reward = 6 tracking terms - 5 costs, done = max of 4 flags, NaN
  guard counting NaNs in the raveled pipeline state (:287-293);
- multi-clip reset draws start_frame = randint(0, 44) (hard-coded upper bound,
  multi_clip_tracking.py:87) and a uniform clip index (:89) with the same
  key-split order so RNG streams line up.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import mujoco
import numpy as np
from jax import numpy as jp

from track_mjx_tpu.envs.base import Env, State
from track_mjx_tpu.envs.task.reward import RewardConfig, compute_tracking_rewards
from track_mjx_tpu.envs.walker.base import BaseWalker
from track_mjx_tpu.io.load import ReferenceClip
from track_mjx_tpu.physics import forward as phys_forward
from track_mjx_tpu.physics import model as phys_model

_SOLVER_IDS = {"cg": 1, "newton": 2}

# Clip fields the env step actually consumes (reward + obs + AutoAlign
# teleport). body_quaternions is loaded/saved by io but never read after
# construction; original_clip_idx is per-clip metadata. Packing these fields
# into one (rows, D) matrix lets the WHOLE per-step reference access be a
# single row gather instead of one gather per field per use site (the
# previous per-field tree gathers were ~15% of rollout device time at
# reference scale).
_PACK_FIELDS = (
    "position",
    "quaternion",
    "joints",
    "velocity",
    "angular_velocity",
    "joints_velocity",
    "body_positions",
)


class SingleClipTracking(Env):
    """Tracking task for a continuous reference clip."""

    def __init__(
        self,
        reference_clip: Optional[ReferenceClip],
        walker: BaseWalker,
        reward_config: RewardConfig,
        physics_steps_per_control_step: int,
        reset_noise_scale: float,
        solver: str,
        iterations: int,
        ls_iterations: int,
        mj_model_timestep: float,
        mocap_hz: int,
        clip_length: int,
        random_init_range: int,
        traj_length: int,
        **kwargs: Any,
    ):
        self.walker = walker
        self.walker._initialize_indices()

        mj_model = walker._mj_model
        if solver.lower() not in _SOLVER_IDS:
            raise ValueError(f"unsupported solver {solver}")
        # the reference maps cg/newton (single_clip_tracking.py:65-72); both
        # are implemented natively (physics/solver.py). Unsupported
        # combinations (newton + elliptic cone) raise at trace time rather
        # than silently substituting (round-1 VERDICT finding).
        mj_model.opt.solver = _SOLVER_IDS[solver.lower()]
        mj_model.opt.iterations = iterations
        mj_model.opt.ls_iterations = ls_iterations
        mj_model.opt.timestep = mj_model_timestep
        mj_model.opt.jacobian = 0  # dense (single_clip_tracking.py:72)

        self._mj_model = mj_model
        self.plan, self.model = phys_model.put_model(mj_model)
        self._n_frames = physics_steps_per_control_step

        self._steps_for_cur_frame = (
            1.0 / (mocap_hz * mj_model.opt.timestep)
        ) / physics_steps_per_control_step

        self._mocap_hz = mocap_hz
        self._reward_config = reward_config
        self._reference_clip = reference_clip
        self._ref_len = traj_length
        self._clip_length = clip_length
        self._random_init_range = random_init_range
        self._reset_noise_scale = reset_noise_scale

        # single-clip pack; MultiClipTracking passes a (n_clips, frames, ...)
        # batch through this ctor and builds its own pack over flat rows
        if reference_clip is not None and reference_clip.position.ndim == 2:
            self._clip_frames = reference_clip.position.shape[0]
            self._build_step_pack(reference_clip, n_leading=1)

    # ---- packed reference access ------------------------------------------
    def _build_step_pack(self, clip: ReferenceClip, n_leading: int) -> None:
        """Concatenates the step-consumed clip fields into one (rows, D)
        matrix (rows = frames, or n_clips*frames when ``n_leading == 2``)."""
        parts = []
        self._pack_slices = {}
        off = 0
        for name in _PACK_FIELDS:
            arr = jp.asarray(getattr(clip, name))
            trailing = arr.shape[n_leading:]
            size = int(np.prod(trailing)) if trailing else 1
            parts.append(arr.reshape(-1, size))
            self._pack_slices[name] = (off, off + size, trailing)
            off += size
        self._pack = jp.concatenate(parts, axis=1)
        self._body_quat_shape = tuple(clip.body_quaternions.shape[n_leading:])

    def _unpack(self, packed: jp.ndarray) -> ReferenceClip:
        """Rebuilds a ReferenceClip view from packed rows of shape (..., D).

        body_quaternions is reconstructed as zeros (it is never consumed
        after io) and original_clip_idx as None."""

        def field(name: str) -> jp.ndarray:
            s, e, shp = self._pack_slices[name]
            v = packed[..., s:e]
            return v.reshape(v.shape[:-1] + shp)

        return ReferenceClip(
            position=field("position"),
            quaternion=field("quaternion"),
            joints=field("joints"),
            body_positions=field("body_positions"),
            velocity=field("velocity"),
            angular_velocity=field("angular_velocity"),
            joints_velocity=field("joints_velocity"),
            body_quaternions=jp.zeros(
                packed.shape[:-1] + self._body_quat_shape, packed.dtype
            ),
        )

    def _clip_row_base(self, info) -> jp.ndarray:
        """Row offset of this env's clip in the pack (0: single clip)."""
        return jp.array(0, int)

    # ---- sizes -----------------------------------------------------------
    @property
    def action_size(self) -> int:
        return self.plan.nu

    @property
    def observation_size(self) -> int:
        # memoized: eval_shape re-traces reset on every call otherwise, and
        # config/trainer code reads this property in hot setup paths
        size = getattr(self, "_observation_size_cache", None)
        if size is None:
            rng = jax.random.PRNGKey(0)
            state = jax.eval_shape(self.reset, rng)
            size = self._observation_size_cache = int(state.obs.shape[-1])
        return size

    @property
    def dt(self):
        return float(self._mj_model.opt.timestep) * self._n_frames

    @property
    def sys(self):
        """Back-compat shim exposing nq/nv/nu like the reference's brax sys."""
        return self.plan

    # ---- pipeline --------------------------------------------------------
    def pipeline_init(self, qpos: jp.ndarray, qvel: jp.ndarray) -> phys_model.Data:
        data = phys_model.make_data(self.plan, self.model)
        data = data.replace(qpos=qpos, qvel=qvel)
        return phys_forward.forward(self.plan, self.model, data)

    def pipeline_step(
        self, data, ctrl: jp.ndarray
    ) -> phys_model.Data:
        """Advances one control step (n physics substeps). Accepts either a
        full Data or the SlimData carried by the auto-reset training wrappers
        (expanded here; forward() recomputes every derived stage anyway)."""
        if isinstance(data, phys_forward.SlimData):
            data = phys_forward.expand_slim(self.plan, self.model, data)
        data = data.replace(ctrl=ctrl)
        return phys_forward.n_step(self.plan, self.model, data, self._n_frames)

    # ---- reset -----------------------------------------------------------
    def reset(self, rng: jp.ndarray) -> State:
        """Single-clip reset: uniform start frame in the valid range.

        The reference's single-clip ``reset`` is a dead stub
        (single_clip_tracking.py:94-119); training always goes through
        subclass resets. We implement the documented intent so the env is
        usable standalone."""
        _, start_rng, rng = jax.random.split(rng, 3)
        frame_range = max(
            self._clip_length - self._random_init_range - self._ref_len, 1
        )
        start_frame = jax.random.randint(start_rng, (), 0, frame_range)
        info = {
            "start_frame": start_frame,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
        }
        return self.reset_from_clip(rng, info, noise=True)

    def reset_from_clip(
        self, rng: jp.ndarray, info: Dict[str, Any], noise: bool = True
    ) -> State:
        """Resets the env to a (noisy) reference-clip frame."""
        _, rng1, rng2 = jax.random.split(rng, 3)

        reference_frame = self._get_reference_frame_at(info, info["start_frame"])
        info["reference_frame"] = reference_frame

        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        new_qpos = jp.concatenate(
            (
                reference_frame.position,
                reference_frame.quaternion,
                reference_frame.joints,
            ),
            axis=0,
        )
        # NOTE: rng1 reused for both noises — reference parity (:153-160)
        qpos = new_qpos + jax.random.uniform(
            rng1, (self.plan.nq,), minval=low, maxval=hi
        )
        qvel = jp.where(
            noise,
            jax.random.uniform(rng1, (self.plan.nv,), minval=low, maxval=hi),
            jp.zeros((self.plan.nv,)),
        )

        data = self.pipeline_init(qpos, qvel)

        reference_obs, proprioceptive_obs = self._get_obs(data, info)
        info["reference_obs_size"] = reference_obs.shape[-1]
        info["proprioceptive_obs_size"] = proprioceptive_obs.shape[-1]
        obs = jp.concatenate([reference_obs, proprioceptive_obs])

        reward, done, zero = jp.zeros(3)
        metrics = {
            "pos_reward": zero,
            "quat_reward": zero,
            "joint_reward": zero,
            "angvel_reward": zero,
            "bodypos_reward": zero,
            "endeff_reward": zero,
            "ctrl_cost": zero,
            "ctrl_diff_cost": zero,
            "energy_cost": zero,
            "done": zero,
            "too_far": zero,
            "bad_pose": zero,
            "bad_quat": zero,
            "fall": zero,
            "nan": zero,
            "joint_distance": zero,
            "summed_pos_distance": zero,
            "quat_distance": zero,
            "var_cost": zero,
            "jerk_cost": zero,
        }

        info["action_buffer"] = jp.zeros(
            (self._reward_config.var_window_size, self.plan.nu)
        )
        info["buffer_index"] = 0

        return State(data, obs, reward, done, metrics, info)

    # ---- step ------------------------------------------------------------
    def step(self, state: State, action: jp.ndarray) -> State:
        data0 = state.pipeline_state
        data = self.pipeline_step(data0, action)
        info = dict(state.info)

        reference_frame, ref_traj = self._get_step_reference(info, data)
        info["reference_frame"] = reference_frame
        info["prev_ctrl"] = action
        buffer = info["action_buffer"]
        idx = info["buffer_index"]
        # one-hot select instead of buffer.at[idx].set: a per-env dynamic
        # index turns into an XLA scatter under the batch vmap (serialized
        # on TPU); the select fuses into the surrounding elementwise ops
        slot = jp.arange(buffer.shape[0]) == idx
        buffer = jp.where(slot[:, None], action[None, :], buffer)
        idx = (idx + 1) % self._reward_config.var_window_size
        info["action_buffer"] = buffer
        info["buffer_index"] = idx

        (
            pos_reward,
            quat_reward,
            joint_reward,
            angvel_reward,
            bodypos_reward,
            endeff_reward,
            ctrl_cost,
            ctrl_diff_cost,
            energy_cost,
            too_far,
            bad_pose,
            bad_quat,
            fall,
            joint_distance,
            summed_pos_distance,
            quat_distance,
            var_cost,
            jerk_cost,
        ) = compute_tracking_rewards(
            data=data,
            reference_frame=reference_frame,
            walker=self.walker,
            action=action,
            info=info,
            reward_config=self._reward_config,
        )

        reference_obs, proprioceptive_obs = self._get_obs_from_traj(data, ref_traj)
        obs = jp.concatenate([reference_obs, proprioceptive_obs])
        reward = (
            joint_reward
            + pos_reward
            + quat_reward
            + angvel_reward
            + bodypos_reward
            + endeff_reward
            - ctrl_cost
            - ctrl_diff_cost
            - energy_cost
            - var_cost
            - jerk_cost
        )
        done = jp.max(jp.array([fall, too_far, bad_pose, bad_quat]))

        # NaN containment (reference :287-293). Summing isnan per leaf (vs
        # the reference's ravel_pytree) lets XLA fuse the checks into each
        # field's producer instead of materializing one giant concatenate of
        # the whole pipeline state every control step; int leaves can't be
        # NaN (the ravel's int->float cast never produces one).
        reward = jp.nan_to_num(reward)
        obs = jp.nan_to_num(obs)
        num_nans = sum(
            jp.isnan(leaf).sum()
            for leaf in jax.tree.leaves(data)
            if jp.issubdtype(leaf.dtype, jp.floating)
        )
        nan = jp.where(num_nans > 0, 1.0, 0.0)
        done = jp.max(jp.array([nan, done]))

        metrics = dict(state.metrics)
        metrics.update(
            pos_reward=pos_reward,
            quat_reward=quat_reward,
            joint_reward=joint_reward,
            angvel_reward=angvel_reward,
            bodypos_reward=bodypos_reward,
            endeff_reward=endeff_reward,
            ctrl_cost=-ctrl_cost,
            ctrl_diff_cost=-ctrl_diff_cost,
            energy_cost=-energy_cost,
            done=done,
            too_far=too_far,
            bad_pose=bad_pose,
            bad_quat=bad_quat,
            fall=fall,
            nan=nan,
            joint_distance=joint_distance,
            summed_pos_distance=summed_pos_distance,
            quat_distance=quat_distance,
            var_cost=-var_cost,
            jerk_cost=-jerk_cost,
        )

        return state.replace(
            pipeline_state=data,
            obs=obs,
            reward=reward,
            done=done,
            metrics=metrics,
            info=info,
        )

    # ---- observations ----------------------------------------------------
    def _get_appendages_pos(self, data: phys_model.Data) -> jp.ndarray:
        """End-effector positions in the torso's egocentric frame."""
        torso_xpos = data.xpos[self.walker.torso_idx]
        torso_xmat = data.xmat[self.walker.torso_idx]
        positions = data.xpos[self.walker.endeff_idxs]
        egocentric_pos = jp.dot(positions - torso_xpos, torso_xmat)
        return egocentric_pos.flatten()

    def _get_proprioception(self, data: phys_model.Data) -> jp.ndarray:
        """[qpos[7:], qvel[6:], qfrc_actuator, body_height, world_zaxis,
        appendage positions] (reference :336-354)."""
        qpos = data.qpos[7:]
        qvel = data.qvel[6:]
        actuator_ctrl = data.qfrc_actuator
        body_height = data.xpos[self.walker.torso_idx][2]
        world_zaxis = data.xmat[self.walker.torso_idx].flatten()[6:]
        appendages_pos = self._get_appendages_pos(data)
        return jp.concatenate(
            [
                qpos,
                qvel,
                actuator_ctrl,
                jp.array([body_height]),
                world_zaxis,
                appendages_pos,
            ]
        )

    def _get_kinematic_sensors(self, data: phys_model.Data) -> jp.ndarray:
        """IMU sensor readings (accelerometer, velocimeter, gyro); parity
        with the (unused) reference helper (:356-368)."""
        named = {}
        for i in range(self.plan.nsensor):
            adr = int(self.plan.sensor_adr[i])
            dim = int(self.plan.sensor_dim[i])
            named[i] = data.sensordata[adr : adr + dim]
        return jp.concatenate([named[i] for i in range(min(3, self.plan.nsensor))])

    def _get_reference_clip(self, info) -> ReferenceClip:
        """Returns the reference clip; overridden by MultiClipTracking."""
        return self._reference_clip

    def _get_reference_frame_at(self, info, frame) -> ReferenceClip:
        """The clip frame at the given index (reward/reset target)."""
        row = self._clip_row_base(info) + jp.clip(
            frame, 0, self._clip_frames - 1
        )
        return self._unpack(self._pack[row])

    def _get_reference_frame(self, info, data) -> ReferenceClip:
        """The clip frame at the current time (reward target)."""
        return self._get_reference_frame_at(info, self._get_cur_frame(info, data))

    def _get_reference_trajectory(self, info, data) -> ReferenceClip:
        """Slices the clip into the (traj_length,) observation window.
        Start clamp matches dynamic_slice_in_dim semantics."""
        start = jp.clip(
            self._get_cur_frame(info, data) + 1,
            0,
            self._clip_frames - self._ref_len,
        )
        rows = self._clip_row_base(info) + start + jp.arange(self._ref_len)
        return self._unpack(self._pack[rows])

    def _get_step_reference(self, info, data) -> tuple[ReferenceClip, ReferenceClip]:
        """(current reward frame, observation trajectory window) from ONE
        fused row gather: row 0 is the clamped current frame, rows 1..L the
        clamped lookahead window."""
        cur = self._get_cur_frame(info, data)
        frame_row = jp.clip(cur, 0, self._clip_frames - 1)
        start = jp.clip(cur + 1, 0, self._clip_frames - self._ref_len)
        rows = self._clip_row_base(info) + jp.concatenate(
            [frame_row[None], start + jp.arange(self._ref_len)]
        )
        packed = self._pack[rows]
        return self._unpack(packed[0]), self._unpack(packed[1:])

    def _get_obs(
        self, data: phys_model.Data, info: Dict[str, Any]
    ) -> tuple[jp.ndarray, jp.ndarray]:
        """(reference_obs, proprioceptive_obs) assembly (reference :394-450)."""
        return self._get_obs_from_traj(data, self._get_reference_trajectory(info, data))

    def _get_obs_from_traj(
        self, data: phys_model.Data, ref_traj: ReferenceClip
    ) -> tuple[jp.ndarray, jp.ndarray]:
        """Obs assembly from an already-gathered trajectory window (the step
        path shares one fused gather between reward and obs)."""
        track_pos_local = self.walker.compute_local_track_positions(
            ref_traj.position, data.qpos
        )
        quat_dist = self.walker.compute_quat_distances(
            ref_traj.quaternion, data.qpos
        )
        joint_dist = self.walker.compute_local_joint_distances(
            ref_traj.joints, data.qpos
        )
        body_pos_dist_local = self.walker.compute_local_body_positions(
            ref_traj.body_positions, data.xpos[1:], data.qpos
        )
        reference_obs = jp.concatenate(
            [track_pos_local, quat_dist, joint_dist, body_pos_dist_local]
        )
        proprioceptive_obs = self._get_proprioception(data)
        return reference_obs, proprioceptive_obs

    def _get_cur_frame(self, info, data: phys_model.Data) -> jp.ndarray:
        """floor(time * mocap_hz) + start_frame (reference :452-454)."""
        return jp.array(
            jp.floor(data.time * self._mocap_hz + info["start_frame"]), int
        )


class MultiClipTracking(SingleClipTracking):
    """Multi-clip variant: random clip + start-frame on reset."""

    def __init__(
        self,
        reference_clip: Optional[ReferenceClip],
        walker: BaseWalker,
        reward_config: Optional[RewardConfig],
        physics_steps_per_control_step: int,
        reset_noise_scale: float,
        solver: str = "cg",
        iterations: int = 4,
        ls_iterations: int = 4,
        mj_model_timestep: float = 0.002,
        mocap_hz: int = 50,
        clip_length: int = 250,
        random_init_range: int = 50,
        traj_length: int = 5,
        **kwargs: Any,
    ):
        super().__init__(
            None,
            walker,
            reward_config,
            physics_steps_per_control_step,
            reset_noise_scale,
            solver,
            iterations,
            ls_iterations,
            mj_model_timestep,
            mocap_hz,
            clip_length,
            random_init_range,
            traj_length,
            **kwargs,
        )
        if reference_clip is not None:
            self._reference_clips = reference_clip
            self._n_clips = reference_clip.position.shape[0]
            self._clip_frames = reference_clip.position.shape[1]
            # pack over (n_clips*frames) flat rows: tree-indexing x[clip_idx]
            # would materialize the WHOLE per-env clip (batch x frames x dims
            # of gather traffic every control step, ~30 ms/step at 4096 envs
            # on a v5e) where a flat-row gather moves only the rows read
            self._build_step_pack(reference_clip, n_leading=2)
        else:
            # pure rendering mode (multi_clip_tracking.py:68-72)
            self._reference_clips = None
            self._n_clips = 0

    def reset(self, rng: jp.ndarray, clip_idx: Optional[int] = None) -> State:
        _, start_rng, clip_rng = jax.random.split(rng, 3)
        # hard-coded 44-frame init window — reference parity
        # (multi_clip_tracking.py:87)
        start_frame = jax.random.randint(start_rng, (), 0, 44)
        if clip_idx is None:
            clip_idx = jax.random.randint(clip_rng, (), 0, self._n_clips)
        info = {
            "clip_idx": clip_idx,
            "start_frame": start_frame,
            "prev_ctrl": jp.zeros((self.plan.nu,)),
        }
        return self.reset_from_clip(rng, info, noise=True)

    def _get_reference_clip(self, info: Dict[str, jp.ndarray]) -> ReferenceClip:
        return jax.tree.map(lambda x: x[info["clip_idx"]], self._reference_clips)

    def _clip_row_base(self, info) -> jp.ndarray:
        return info["clip_idx"] * self._clip_frames
