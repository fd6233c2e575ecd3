"""MjSpec editing utilities: dm-style uniform rescale and ghost recoloring.

Behavioral parity with the reference's spec utilities
(track_mjx/environment/walker/spec_utils.py):
- ``dm_scale_spec`` (:19-52): copies the spec and recursively scales body
  positions and geom fromto/size/pos starting from the body named "walker";
  actuator gears scale by scale**2 (muscle cross-section argument); keyframe
  qpos z is scaled. Sites and joint positions are intentionally NOT scaled —
  the reference's active code path leaves them untouched.
- ``recolour_tree`` (:105-118): translucent ghost recoloring for render pairs.
"""

from __future__ import annotations

import mujoco
import numpy as np


def dm_scale_spec(
    spec: mujoco.MjSpec, scale: float, root_body: str = "walker"
) -> mujoco.MjSpec:
    """Returns a copy of `spec` uniformly rescaled by `scale`."""
    scaled = spec.copy()

    def scale_bodies(parent):
        body = parent.first_body()
        while body:
            if body.pos is not None:
                body.pos = body.pos * scale
            for geom in body.geoms:
                geom.fromto = geom.fromto * scale
                geom.size = geom.size * scale
                if geom.pos is not None:
                    geom.pos = geom.pos * scale
            scale_bodies(body)
            body = parent.next_body(body)

    for actuator in scaled.actuators:
        # muscle force-generating capacity scales with cross-sectional area
        actuator.gear = actuator.gear * scale * scale

    for key in scaled.keys:
        qpos = np.array(key.qpos)
        qpos[2] = qpos[2] * scale
        key.qpos = qpos

    scale_bodies(scaled.body(root_body))
    return scaled


def recolour_geom(geom, rgba) -> None:
    """Sets color and moves the geom to a separate collision group."""
    geom.rgba = list(rgba)
    geom.group = 2


def recolour_tree(body, rgba) -> None:
    """Recursively recolors all geoms under `body` (ghost rendering)."""
    for geom in body.geoms:
        recolour_geom(geom, rgba)
    for child in body.bodies:
        recolour_tree(child, rgba)
