"""Fruit-fly walker (behavioral parity: track_mjx/environment/walker/fly.py).

Same build pattern as the rodent: optional torque conversion, dm-style
rescale, torso body is "thorax" (fly.py:34)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Sequence

import jax.numpy as jp
import mujoco
import numpy as np

from track_mjx_tpu.envs.walker import spec_utils
from track_mjx_tpu.envs.walker.base import BaseWalker, DEFAULT_ASSET_ROOT

_XML_PATH = "fruitfly/fruitfly_force_fast.xml"


class Fly(BaseWalker):
    """Fruit-fly walker built through MuJoCo MjSpec."""

    def __init__(
        self,
        joint_names: Sequence[str],
        body_names: Sequence[str],
        end_eff_names: Sequence[str],
        torque_actuators: bool = False,
        rescale_factor: float = 1.0,
        *,
        asset_root: str | None = None,
        reproduce_joint_index_quirk: bool = True,
    ):
        self._torso_name = "thorax"
        self._asset_root = asset_root or DEFAULT_ASSET_ROOT
        self.joint_names = list(joint_names)
        self.body_names = list(body_names)
        self.end_eff_names = list(end_eff_names)
        self.torque_actuators = torque_actuators
        self.rescale_factor = rescale_factor
        self.reproduce_joint_index_quirk = reproduce_joint_index_quirk

        self._mj_spec = self._build_spec(torque_actuators, rescale_factor)
        self._mj_model = self._mj_spec.compile()
        self._initialize_indices()

    def _build_spec(
        self, torque_actuators: bool, rescale_factor: float
    ) -> mujoco.MjSpec:
        path = Path(self._asset_root) / _XML_PATH
        spec = mujoco.MjSpec.from_file(str(path))

        if torque_actuators:
            logging.info("Converting to torque actuators")
            for actuator in spec.actuators:
                if actuator.forcerange.size >= 2:
                    actuator.gainprm[0] = actuator.forcerange[1]
                actuator.biastype = mujoco.mjtBias.mjBIAS_NONE
                actuator.biasprm = np.zeros((10, 1))

        if rescale_factor != 1.0:
            logging.info("Rescaling body tree with scale factor %s", rescale_factor)
            spec = spec_utils.dm_scale_spec(spec, rescale_factor)

        return spec

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
