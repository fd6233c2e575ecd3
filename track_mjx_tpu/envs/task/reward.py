"""Imitation reward library (behavioral parity: track_mjx/environment/task/
reward.py).

Every term reproduces the reference formula exactly:
- tracking terms are weight * exp(-scale * sum(dist**2)) (:80-216)
- bounded quaternion distance 0.5*arccos(min(1, 2<q1,q2>^2 - 1)) (:57-77)
- control/ctrl-diff costs w * sum(a^2) (:219-247)
- energy cost clamped at 50 (:250-260)
- termination penalties with axis-scaled position distance (:263-311)
- windowed action-variance and jerk costs over the action ring buffer
  (:314-356; the jerk rotation is re-expressed with static circular shifts)
The orchestrator returns the same 18-tuple as the reference (:359-485).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import jax.numpy as jp
from flax import struct

from track_mjx_tpu.envs.walker.base import BaseWalker
from track_mjx_tpu.io.load import ReferenceClip


@struct.dataclass
class RewardConfig:
    """Weights and scales for the imitation reward terms (reference :15-54)."""

    too_far_dist: float
    bad_pose_dist: float
    bad_quat_dist: float
    ctrl_cost_weight: float
    ctrl_diff_cost_weight: float
    energy_cost_weight: float
    pos_reward_weight: float
    quat_reward_weight: float
    joint_reward_weight: float
    angvel_reward_weight: float
    bodypos_reward_weight: float
    endeff_reward_weight: float
    healthy_z_range: Tuple[float, float]
    pos_reward_exp_scale: float
    quat_reward_exp_scale: float
    joint_reward_exp_scale: float
    angvel_reward_exp_scale: float
    bodypos_reward_exp_scale: float
    endeff_reward_exp_scale: float
    penalty_pos_distance_scale: jp.ndarray
    var_window_size: int = 50
    var_coeff: float = 5e-2
    jerk_coeff: float = 5e-4

    def __post_init__(self):
        if isinstance(self.penalty_pos_distance_scale, (list, tuple)):
            object.__setattr__(
                self,
                "penalty_pos_distance_scale",
                jp.array(self.penalty_pos_distance_scale),
            )


def bounded_quat_dist(source: jp.ndarray, target: jp.ndarray) -> jp.ndarray:
    """Quaternion distance limited to pi/2 (reference :57-77)."""
    source /= jp.linalg.norm(source, axis=-1, keepdims=True)
    target /= jp.linalg.norm(target, axis=-1, keepdims=True)
    dist = 2 * jp.einsum("...i,...i", source, target) ** 2 - 1
    dist = jp.minimum(1.0, dist)
    return 0.5 * jp.arccos(dist)[..., None]


def compute_pos_reward(pos_array, reference_clip_pos, weight, exp_scale):
    """Root-position tracking reward; also returns the raw distance."""
    pos_distance = pos_array - reference_clip_pos
    reward = weight * jp.exp(-exp_scale * jp.sum(pos_distance**2))
    return reward, pos_distance


def compute_quat_reward(quat_array, reference_clip_quat, weight, exp_scale):
    """Root-orientation tracking reward; also returns the distance."""
    quat_distance = jp.sum(bounded_quat_dist(quat_array, reference_clip_quat) ** 2)
    return weight * jp.exp(-exp_scale * quat_distance), quat_distance


def compute_joint_reward(joint_array, reference_clip_joint, weight, exp_scale):
    """Joint-angle tracking reward; also returns the distance."""
    joint_distance = jp.sum((joint_array - reference_clip_joint) ** 2)
    return weight * jp.exp(-exp_scale * joint_distance), joint_distance


def compute_angvel_reward(angvel_array, reference_clip_angvel, weight, exp_scale):
    """Root angular-velocity tracking reward."""
    return weight * jp.exp(
        -exp_scale * jp.sum((angvel_array - reference_clip_angvel) ** 2)
    )


def compute_bodypos_reward(bodypos_array, reference_clip_bodypos, weight, exp_scale):
    """Body-position tracking reward."""
    return weight * jp.exp(
        -exp_scale
        * jp.sum((bodypos_array - reference_clip_bodypos).flatten() ** 2)
    )


def compute_endeff_reward(endeff_array, reference_clip_endeff, weight, exp_scale):
    """End-effector tracking reward."""
    return weight * jp.exp(
        -exp_scale * jp.sum((endeff_array - reference_clip_endeff).flatten() ** 2)
    )


def compute_ctrl_cost(action, weight):
    """Quadratic control cost."""
    return weight * jp.sum(jp.square(action))


def compute_ctrl_diff_cost(action, prev_action, weight):
    """Quadratic control-rate cost."""
    return weight * jp.sum(jp.square(prev_action - action))


def compute_energy_cost(qvel, qfrc_actuator, weight):
    """Mechanical-power cost, clamped at 50 (reference :250-260)."""
    return weight * jp.minimum(jp.sum(jp.abs(qvel) * jp.abs(qfrc_actuator)), 50.0)


def compute_health_penalty(torso_z, healthy_z_range):
    """1.0 when the torso leaves the healthy z-range, else 0.0."""
    min_z, max_z = healthy_z_range
    is_healthy = jp.where(torso_z < min_z, 0.0, 1.0)
    is_healthy = jp.where(torso_z > max_z, 0.0, is_healthy)
    return 1.0 - is_healthy


def compute_penalty_terms(
    pos_distance,
    joint_distance,
    quat_distance,
    too_far_dist,
    bad_pose_dist,
    bad_quat_dist,
    penalty_pos_distance_scale,
):
    """too_far / bad_pose / bad_quat termination flags (reference :282-311)."""
    summed_pos_distance = jp.sum((pos_distance * penalty_pos_distance_scale) ** 2)
    too_far = jp.where(summed_pos_distance > too_far_dist, 1.0, 0.0)
    bad_pose = jp.where(joint_distance > bad_pose_dist, 1.0, 0.0)
    bad_quat = jp.where(quat_distance > bad_quat_dist, 1.0, 0.0)
    return too_far, bad_pose, bad_quat, summed_pos_distance


def compute_action_variance_cost(info: Dict[str, Any], var_weight: float):
    """Windowed action-variance cost over the ring buffer (reference :314-330)."""
    buffer = info["action_buffer"]
    mean_act = jp.mean(buffer, axis=0)
    var_act = jp.mean((buffer - mean_act) ** 2, axis=0)
    return var_weight * jp.sum(var_act)


def compute_jerk_cost(info: Dict[str, Any], var_window_size: int, jerk_weight: float):
    """Second-difference (jerk) cost over the time-ordered ring buffer
    (value parity with the reference's buffer-doubling rotation, :333-356)."""
    buffer = info["action_buffer"]
    idx = info["buffer_index"]
    # The reference rotates the ring into time order with a buffer-doubling
    # concat + dynamic_slice; per-env idx makes that a serialized gather
    # under the batch vmap. Second differences are shift-invariant, so
    # compute them circularly with STATIC rolls and mask out the two
    # windows that cross the write point: time-ordered entry t lives at
    # ring slot (idx+t) % W, so slots whose time position is >= W-2 are
    # exactly the wrapping windows the reference's slice never forms.
    d2 = (
        jp.roll(buffer, -2, axis=0) - 2 * jp.roll(buffer, -1, axis=0) + buffer
    )
    time_pos = (jp.arange(var_window_size) - idx) % var_window_size
    valid = time_pos < var_window_size - 2
    return jerk_weight * jp.sum(jp.where(valid[:, None], d2, 0.0) ** 2)


def compute_tracking_rewards(
    data,
    reference_frame: ReferenceClip,
    walker: BaseWalker,
    action: jp.ndarray,
    info: Dict[str, jp.ndarray],
    reward_config: RewardConfig,
) -> Tuple[Union[jp.ndarray, Dict[str, jp.ndarray]], ...]:
    """Computes the full 18-output reward/penalty tuple (reference :359-485)."""
    pos_reward, pos_distance = compute_pos_reward(
        data.qpos[:3],
        reference_frame.position,
        reward_config.pos_reward_weight,
        reward_config.pos_reward_exp_scale,
    )
    quat_reward, quat_distance = compute_quat_reward(
        data.qpos[3:7],
        reference_frame.quaternion,
        reward_config.quat_reward_weight,
        reward_config.quat_reward_exp_scale,
    )
    joint_reward, joint_distance = compute_joint_reward(
        data.qpos[7:],
        reference_frame.joints,
        reward_config.joint_reward_weight,
        reward_config.joint_reward_exp_scale,
    )
    angvel_reward = compute_angvel_reward(
        data.qvel[3:6],
        reference_frame.angular_velocity,
        reward_config.angvel_reward_weight,
        reward_config.angvel_reward_exp_scale,
    )
    # xpos[1:] indexing reproduces the reference's floor-body offset behavior
    # (reference :419-435)
    bodypos_reward = compute_bodypos_reward(
        walker.get_body_positions(data.xpos[1:]),
        reference_frame.body_positions[walker.body_idxs],
        reward_config.bodypos_reward_weight,
        reward_config.bodypos_reward_exp_scale,
    )
    endeff_reward = compute_endeff_reward(
        walker.get_end_effector_positions(data.xpos[1:]),
        reference_frame.body_positions[walker.endeff_idxs],
        reward_config.endeff_reward_weight,
        reward_config.endeff_reward_exp_scale,
    )
    ctrl_cost = compute_ctrl_cost(action, reward_config.ctrl_cost_weight)
    ctrl_diff_cost = compute_ctrl_diff_cost(
        action, info["prev_ctrl"], reward_config.ctrl_diff_cost_weight
    )
    energy_cost = compute_energy_cost(
        data.qvel[6:], data.qfrc_actuator[6:], reward_config.energy_cost_weight
    )
    torso_z = walker.get_torso_position(data.xpos)[2]
    fall = compute_health_penalty(torso_z, reward_config.healthy_z_range)
    too_far, bad_pose, bad_quat, summed_pos_distance = compute_penalty_terms(
        pos_distance,
        joint_distance,
        quat_distance,
        reward_config.too_far_dist,
        reward_config.bad_pose_dist,
        reward_config.bad_quat_dist,
        reward_config.penalty_pos_distance_scale,
    )
    action_variance_cost = compute_action_variance_cost(
        info, reward_config.var_coeff
    )
    jerk_cost = compute_jerk_cost(
        info, reward_config.var_window_size, reward_config.jerk_coeff
    )
    return (
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
        action_variance_cost,
        jerk_cost,
    )
