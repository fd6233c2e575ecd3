"""Rodent walker (behavioral parity: track_mjx/environment/walker/rodent.py).

Builds the rodent MjSpec from XML, applies the optional torque-actuator
conversion (gainprm[0] <- forcerange[1], biastype NONE, biasprm zeroed;
rodent.py:69-78 — note dyntype/filter activation is intentionally preserved)
and the dm-style rescale (rodent.py:80-86), compiles, and caches index tables
(rodent.py:89-114).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax.numpy as jp
import mujoco
import numpy as np

from track_mjx_tpu.envs.walker import spec_utils
from track_mjx_tpu.envs.walker.base import BaseWalker, DEFAULT_ASSET_ROOT

_XML_PATH = "rodent/rodent.xml"  # relative to the asset root


class Rodent(BaseWalker):
    """Rodent walker built through MuJoCo MjSpec."""

    def __init__(
        self,
        joint_names: Sequence[str],
        body_names: Sequence[str],
        end_eff_names: Sequence[str],
        *,
        torque_actuators: bool = False,
        rescale_factor: float = 0.9,
        asset_root: str | None = None,
        reproduce_joint_index_quirk: bool = True,
    ):
        self._torso_name = "torso"
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
            for actuator in spec.actuators:
                if actuator.forcerange.size >= 2:
                    actuator.gainprm[0] = actuator.forcerange[1]
                actuator.biastype = mujoco.mjtBias.mjBIAS_NONE
                actuator.biasprm = np.zeros((10, 1))

        if rescale_factor != 1.0:
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
