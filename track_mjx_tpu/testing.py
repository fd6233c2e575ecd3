"""Tiny fast walker + env fixtures for tests, dry-runs and CI smoke paths."""

from __future__ import annotations

import jax.numpy as jp
import mujoco
import numpy as np

from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.task.tracking import MultiClipTracking, SingleClipTracking
from track_mjx_tpu.envs.walker.base import BaseWalker
from track_mjx_tpu.io.synthetic import synthesize_clips

TOY_WALKER_XML = """
<mujoco>
  <option timestep="0.002" solver="CG" iterations="4" ls_iterations="4"/>
  <default>
    <geom contype="1" conaffinity="0"/>
    <joint damping="0.1"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" contype="1" conaffinity="1"/>
    <body name="walker" pos="0 0 0.1">
      <freejoint/>
      <body name="torso">
        <geom name="torso_g" type="capsule" fromto="-0.05 0 0 0.05 0 0"
              size="0.03" mass="0.3"/>
        <body name="leg_L" pos="0 0.04 0">
          <joint name="hip_L" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
          <geom name="leg_L_g" type="capsule" fromto="0 0 0 0 0 -0.08"
                size="0.015" mass="0.05"/>
          <body name="foot_L" pos="0 0 -0.08">
            <joint name="knee_L" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
            <geom name="foot_L_g" type="capsule" fromto="0 0 0 0.03 0 0"
                  size="0.012" mass="0.02"/>
          </body>
        </body>
        <body name="leg_R" pos="0 -0.04 0">
          <joint name="hip_R" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
          <geom name="leg_R_g" type="capsule" fromto="0 0 0 0 0 -0.08"
                size="0.015" mass="0.05"/>
          <body name="foot_R" pos="0 0 -0.08">
            <joint name="knee_R" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
            <geom name="foot_R_g" type="capsule" fromto="0 0 0 0.03 0 0"
                  size="0.012" mass="0.02"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="hip_L" gear="1" ctrlrange="-1 1"/>
    <motor joint="knee_L" gear="1" ctrlrange="-1 1"/>
    <motor joint="hip_R" gear="1" ctrlrange="-1 1"/>
    <motor joint="knee_R" gear="1" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


class ToyWalker(BaseWalker):
    """Minimal 10-dof walker for fast tests.

    contact=False removes the floor's collision bits: dynamics become smooth
    articulated motion (limit rows still active, so the constraint solver
    still runs). Contact dynamics amplify f32 reduction-order roundoff by
    ~1e3 per few steps (measured), so cross-mesh equivalence checks need the
    smooth variant to assert tight tolerances."""

    def __init__(
        self,
        reproduce_joint_index_quirk: bool = True,
        contact: bool = True,
    ):
        self._torso_name = "torso"
        self.joint_names = ["hip_L", "knee_L", "hip_R", "knee_R"]
        self.body_names = ["torso", "leg_L", "foot_L", "leg_R", "foot_R"]
        self.end_eff_names = ["foot_L", "foot_R"]
        self.torque_actuators = False
        self.rescale_factor = 1.0
        self.reproduce_joint_index_quirk = reproduce_joint_index_quirk
        xml = TOY_WALKER_XML
        if not contact:
            xml = xml.replace(
                'type="plane" size="2 2 0.1" contype="1" conaffinity="1"',
                'type="plane" size="2 2 0.1" contype="0" conaffinity="0"',
            )
        self._mj_spec = mujoco.MjSpec.from_string(xml)
        self._mj_model = self._mj_spec.compile()
        self._initialize_indices()

    def _build_spec(self, torque_actuators, rescale_factor):
        return self._mj_spec

    def _initialize_indices(self) -> None:
        name2id = lambda objtype, name: mujoco.mj_name2id(
            self._mj_model, objtype, name
        )
        self._joint_idxs = jp.array(
            [name2id(mujoco.mjtObj.mjOBJ_JOINT, j) for j in self.joint_names]
        )
        self._body_idxs = jp.array(
            [name2id(mujoco.mjtObj.mjOBJ_BODY, b) for b in self.body_names]
        )
        self._endeff_idxs = jp.array(
            [name2id(mujoco.mjtObj.mjOBJ_BODY, e) for e in self.end_eff_names]
        )
        self._torso_idx = name2id(mujoco.mjtObj.mjOBJ_BODY, self._torso_name)


def toy_reward_config(var_window_size: int = 10) -> RewardConfig:
    return RewardConfig(
        too_far_dist=0.1,
        bad_pose_dist=50.0,
        bad_quat_dist=2.0,
        ctrl_cost_weight=0.01,
        ctrl_diff_cost_weight=0.01,
        energy_cost_weight=0.01,
        pos_reward_weight=1.0,
        quat_reward_weight=1.0,
        joint_reward_weight=1.0,
        angvel_reward_weight=0.1,
        bodypos_reward_weight=0.1,
        endeff_reward_weight=1.0,
        healthy_z_range=(0.02, 0.5),
        pos_reward_exp_scale=100.0,
        quat_reward_exp_scale=2.0,
        joint_reward_exp_scale=0.25,
        angvel_reward_exp_scale=0.5,
        bodypos_reward_exp_scale=8.0,
        endeff_reward_exp_scale=100.0,
        penalty_pos_distance_scale=jp.array([1.0, 1.0, 0.5]),
        var_window_size=var_window_size,
        var_coeff=5e-3,
        jerk_coeff=5e-4,
    )


def make_toy_env(
    multi_clip: bool = True,
    n_clips: int = 2,
    clip_length: int = 60,
    mocap_hz: int = 50,
    physics_steps_per_control_step: int = 2,
    solver: str = "cg",
    contact: bool = True,
):
    """Builds a small tracking env over synthetic clips."""
    walker = ToyWalker(contact=contact)
    clips = synthesize_clips(
        walker._mj_model,
        n_clips=n_clips,
        n_frames=clip_length,
        mocap_hz=mocap_hz,
        joint_amplitude=0.15,
    )
    cls = MultiClipTracking if multi_clip else SingleClipTracking
    if not multi_clip:
        import jax

        clips = jax.tree.map(lambda x: x[0], clips)
    env = cls(
        reference_clip=clips,
        walker=walker,
        reward_config=toy_reward_config(),
        physics_steps_per_control_step=physics_steps_per_control_step,
        reset_noise_scale=1e-3,
        solver=solver,
        iterations=4,
        ls_iterations=4,
        mj_model_timestep=0.005,
        mocap_hz=mocap_hz,
        clip_length=clip_length,
        random_init_range=10,
        traj_length=5,
    )
    return env
