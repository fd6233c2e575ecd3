"""Walker base class: MjSpec build, index tables, egocentric obs math.

Behavioral parity with the reference walker layer
(track_mjx/environment/walker/base.py):
- name lists -> JAX index arrays (:89-168 accessors).
- ``compute_local_track_positions`` vmaps rotate(ref_pos - root, root_quat)
  (:170-190).
- ``compute_quat_distances`` via relative_quat (:192-210).
- ``compute_local_joint_distances`` reproduces the deliberate
  ``joint_idxs - 1`` off-by-one "hot fix" (:225-229) behind
  ``reproduce_joint_index_quirk`` (default True for bit-parity).
- ``compute_local_body_positions`` double-vmap rotate (:236-258).

TPU-first: walkers also own the compiled physics structures (PhysicsPlan +
Model from our engine) instead of a brax System.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jp
import mujoco

from track_mjx_tpu.ops import quaternion as quat

# Asset root: the framework vendors every walker XML plus the small
# rodent/stick assets in-package; the fly's large visual meshes are fetched
# by tools/fetch_assets.py (sha256-manifest-verified) or generated as
# placeholders (fly.ensure_fly_assets). TRACK_MJX_TPU_ASSETS overrides with
# an external asset checkout.
DEFAULT_ASSET_ROOT = os.environ.get(
    "TRACK_MJX_TPU_ASSETS",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets"),
)


@dataclass
class BaseWalker(ABC):
    """Abstract base for walker body models (rodent, fly, stick, ...)."""

    joint_names: Sequence[str]
    body_names: Sequence[str]
    end_eff_names: Sequence[str]
    torque_actuators: bool = False
    rescale_factor: float = 1.0
    reproduce_joint_index_quirk: bool = True

    _joint_idxs: jp.ndarray = field(init=False, repr=False)
    _body_idxs: jp.ndarray = field(init=False, repr=False)
    _endeff_idxs: jp.ndarray = field(init=False, repr=False)
    _torso_idx: int = field(init=False, repr=False)
    _mj_model: mujoco.MjModel = field(init=False, repr=False)
    _mj_spec: mujoco.MjSpec = field(init=False, repr=False)

    @abstractmethod
    def _build_spec(
        self, torque_actuators: bool, rescale_factor: float
    ) -> mujoco.MjSpec:
        """Parses XML -> MjSpec, applies optional edits, returns the spec."""

    @abstractmethod
    def _initialize_indices(self) -> None:
        """Sets _joint_idxs, _body_idxs, _endeff_idxs, _torso_idx."""

    # ---- index accessors -------------------------------------------------
    @property
    def joint_idxs(self) -> jp.ndarray:
        return self._joint_idxs

    @property
    def body_idxs(self) -> jp.ndarray:
        return self._body_idxs

    @property
    def endeff_idxs(self) -> jp.ndarray:
        return self._endeff_idxs

    @property
    def torso_idx(self) -> int:
        return self._torso_idx

    # ---- qpos/xpos accessors ---------------------------------------------
    def get_joint_positions(self, qpos: jp.ndarray) -> jp.ndarray:
        return qpos[self.joint_idxs]

    def get_body_positions(self, xpos: jp.ndarray) -> jp.ndarray:
        return xpos[self.body_idxs]

    def get_end_effector_positions(self, xpos: jp.ndarray) -> jp.ndarray:
        return xpos[self.endeff_idxs]

    def get_torso_position(self, xpos: jp.ndarray) -> jp.ndarray:
        return xpos[self.torso_idx]

    def get_root_from_qpos(self, qpos: jp.ndarray) -> jp.ndarray:
        return qpos[:3]

    def get_root_quaternion_from_qpos(self, qpos: jp.ndarray) -> jp.ndarray:
        return qpos[3:7]

    def get_all_loc_joints(self, qpos: jp.ndarray) -> jp.ndarray:
        return qpos[7:]

    # ---- egocentric observation math -------------------------------------
    def compute_local_track_positions(
        self, ref_positions: jp.ndarray, qpos: jp.ndarray
    ) -> jp.ndarray:
        """Root-relative reference positions rotated by the root quaternion."""
        root = self.get_root_from_qpos(qpos)
        rquat = self.get_root_quaternion_from_qpos(qpos)
        return jax.vmap(quat.rotate, in_axes=(0, None))(
            ref_positions - root, rquat
        ).flatten()

    def compute_quat_distances(
        self, ref_quats: jp.ndarray, qpos: jp.ndarray
    ) -> jp.ndarray:
        """Relative quaternions between reference and agent root."""
        rquat = self.get_root_quaternion_from_qpos(qpos)
        return jax.vmap(quat.relative_quat, in_axes=(0, None))(
            ref_quats, rquat
        ).flatten()

    def compute_local_joint_distances(
        self, ref_joints: jp.ndarray, qpos: jp.ndarray
    ) -> jp.ndarray:
        """Joint-space distance to the reference trajectory slice."""
        joints = self.get_all_loc_joints(qpos)
        if self.reproduce_joint_index_quirk:
            # reference's deliberate OB1 "hot fix" (base.py:227-229)
            joint_indices = self._joint_idxs - 1
        else:
            joint_indices = self._joint_idxs
        return (ref_joints - joints)[:, joint_indices].flatten()

    def compute_local_body_positions(
        self, ref_positions: jp.ndarray, xpos: jp.ndarray, qpos: jp.ndarray
    ) -> jp.ndarray:
        """Body-position distances rotated into the agent's root frame."""
        rquat = self.get_root_quaternion_from_qpos(qpos)
        return jax.vmap(
            lambda a, b: jax.vmap(quat.rotate, in_axes=(0, None))(a, b),
            in_axes=(0, None),
        )((ref_positions - xpos)[:, self._body_idxs], rquat).flatten()
