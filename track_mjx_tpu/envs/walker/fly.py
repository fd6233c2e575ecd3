"""Fruit-fly walker (behavioral parity: track_mjx/environment/walker/fly.py).

Same build pattern as the rodent: optional torque conversion, dm-style
rescale, torso body is "thorax" (fly.py:34)."""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Sequence

import jax.numpy as jp
import mujoco
import numpy as np

from track_mjx_tpu.envs.walker import spec_utils
from track_mjx_tpu.envs.walker.base import BaseWalker, DEFAULT_ASSET_ROOT

_XML_PATH = "fruitfly/fruitfly_force_fast.xml"

# A minimal valid OBJ (small cube, outward winding — MuJoCo derives mesh
# inertia from the signed hull volume) used for mesh files missing from the
# asset tree. The vendored package ships all fly XMLs but not the ~59 MB of
# visual .obj meshes; tools/fetch_assets.py downloads the canonical ones
# (sha256 manifest) and this fallback covers whatever is absent. Visual
# fidelity and the meshes' modest inertia contribution differ from the
# canonical fly (total mass +7% when ALL meshes are placeholders); collision
# geoms are unaffected (the fly's collision shapes are primitives). NOTE: a
# placeholder standing in for a STRUCTURAL mesh (one that defines a body's
# only mass) can make that body's inertia numerically singular and fail the
# compile — vendored assets_gz covers all such meshes, so placeholders only
# ever cover upstream-missing visual pieces.
_PLACEHOLDER_OBJ = """# placeholder mesh (missing from asset checkout)
v -0.01 -0.01 -0.01
v 0.01 -0.01 -0.01
v 0.01 0.01 -0.01
v -0.01 0.01 -0.01
v -0.01 -0.01 0.01
v 0.01 -0.01 0.01
v 0.01 0.01 0.01
v -0.01 0.01 0.01
f 1 3 2
f 1 4 3
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 2 3 7
f 2 7 6
f 3 4 8
f 3 8 7
f 4 1 5
f 4 5 8
"""


def ensure_fly_assets(asset_root: str) -> str:
    """Returns a usable fruitfly asset dir: the original if complete, else a
    shadow dir of symlinks plus recovered meshes.

    Missing meshes are resolved in priority order: (1) the gzipped canonical
    meshes vendored in the package (assets_gz/ — the fly's MASS DISTRIBUTION
    lives in its visual meshes: mesh geoms carry density 0.478 while the
    collision primitives are density 0, so mesh fidelity is a physics
    requirement, not cosmetics); (2) generated placeholder cubes (loud
    warning — dynamics will differ)."""
    import gzip
    import re

    src = Path(asset_root) / "fruitfly"
    xmls = list(src.glob("*.xml"))
    referenced = set()
    for xml in xmls:
        referenced |= set(re.findall(r'file="assets/([^"]+)"', xml.read_text()))
    present = (
        set(p.name for p in (src / "assets").iterdir())
        if (src / "assets").exists()
        else set()
    )
    missing = referenced - present
    if not missing:
        return str(src)

    vendored_gz = Path(__file__).resolve().parent / "assets" / "fruitfly" / "assets_gz"

    shadow = Path(
        os.environ.get(
            "TRACK_MJX_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "track_mjx_tpu"),
        )
    ) / "fruitfly"
    (shadow / "assets").mkdir(parents=True, exist_ok=True)
    for xml in xmls:
        dst = shadow / xml.name
        if not dst.exists():
            dst.symlink_to(xml)
    for name in present:
        dst = shadow / "assets" / name
        if not dst.exists():
            dst.symlink_to(src / "assets" / name)
    placeholders = []
    for name in missing:
        dst = shadow / "assets" / name
        if dst.exists():
            continue
        gz = vendored_gz / f"{name}.gz"
        if gz.exists():
            dst.write_bytes(gzip.decompress(gz.read_bytes()))
        else:
            dst.write_text(_PLACEHOLDER_OBJ)
            placeholders.append(name)
    if placeholders:
        logging.warning(
            "fly assets: generated %d placeholder meshes (%s) in %s — the "
            "fly's mass distribution comes from its meshes; run "
            "tools/fetch_assets.py for the canonical model",
            len(placeholders),
            ", ".join(sorted(placeholders)),
            shadow,
        )
    return str(shadow)


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
        fly_dir = ensure_fly_assets(self._asset_root)
        path = Path(fly_dir) / Path(_XML_PATH).name
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
