"""GL-free software renderer for offline rollout videos.

The reference renders rollout videos through ``mujoco.Renderer``
(track_mjx/analysis/render.py:181-239), which requires an OpenGL context —
unavailable on headless TPU hosts (no EGL/osmesa in this image). This module
provides ``SoftwareRenderer``, a drop-in subset of the ``mujoco.Renderer``
API (``update_scene`` / ``render`` / ``close``) that rasterizes MuJoCo's
CPU-side abstract scene (``mjv_updateScene`` needs no GL) with a painter's
algorithm onto a matplotlib Agg canvas. Videos therefore work everywhere;
when a real GL backend exists the GL renderer is preferred (see
``analysis.render.make_rollout_renderer``).

Fidelity scope: geoms are drawn as filled 2-D projections (spheres/ellipsoids
as discs, capsules/cylinders as stadium shapes, boxes/meshes as silhouette
hulls of their bounding corners, planes as a backdrop) with per-geom rgba and
camera-correct perspective from the mjvGLCamera frustum. This is a preview
renderer for tracking-quality videos (walker + ghost pose comparison), not a
shaded reproduction of the GL output.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import mujoco
import numpy as np

# mjtGeom values we rasterize (decor/label geoms above mjGEOM_ARROW are skipped)
_PLANE, _HFIELD, _SPHERE, _CAPSULE, _ELLIPSOID, _CYLINDER, _BOX, _MESH = range(8)


def _convex_hull_2d(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; pts (N,2) -> hull vertices CCW (M,2)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def cross2(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(seq):
        out: List[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float64,
)


def _clip_points_near(pts_cam: np.ndarray, near: float) -> np.ndarray:
    """Clip a convex corner set (camera space, z = depth) to z >= near.

    Points behind the near plane are replaced by the intersections of every
    pairwise segment with the plane. Pairwise segments are a superset of the
    hull's edges, so conv(front points + crossings) equals the true clipped
    hull and the subsequent 2-D projection cannot smear behind-camera corners
    across the screen (the failure mode of naive z-clamping, most visible on
    the 20 m plane backdrop). Returns (M, 3); M == 0 if all behind."""
    eps = near * 1.0001
    front = pts_cam[:, 2] >= eps
    if front.all():
        return pts_cam
    kept = [pts_cam[front]]
    n = len(pts_cam)
    for i in range(n):
        zi = pts_cam[i, 2]
        for j in range(i + 1, n):
            zj = pts_cam[j, 2]
            if (zi >= eps) != (zj >= eps):
                t = (eps - zi) / (zj - zi)
                kept.append((pts_cam[i] + t * (pts_cam[j] - pts_cam[i]))[None])
    return np.concatenate(kept, axis=0)


class SoftwareRenderer:
    """Rasterizes ``MjvScene`` abstract geoms without an OpenGL context.

    Duck-types the ``mujoco.Renderer`` calls used by the analysis layer:
    ``update_scene(data, camera=..., scene_option=...)`` then
    ``render() -> (H, W, 3) uint8``.
    """

    def __init__(self, model: mujoco.MjModel, height: int = 480, width: int = 640):
        self._model = model
        self.height = int(height)
        self.width = int(width)
        self._scene = mujoco.MjvScene(model, maxgeom=max(1000, model.ngeom * 2 + 64))
        self._camera = mujoco.MjvCamera()
        mujoco.mjv_defaultFreeCamera(model, self._camera)
        self._option = mujoco.MjvOption()
        # lazy Agg figure, reused across frames
        self._fig = None
        self._ax = None

    # -- mujoco.Renderer API -------------------------------------------------

    def update_scene(
        self,
        data: mujoco.MjData,
        camera=-1,
        scene_option: Optional[mujoco.MjvOption] = None,
    ) -> None:
        cam = self._camera
        if isinstance(camera, str):
            cam_id = mujoco.mj_name2id(
                self._model, mujoco.mjtObj.mjOBJ_CAMERA.value, camera
            )
            if cam_id < 0:
                raise ValueError(f"camera {camera!r} not found")
            camera = cam_id
        if isinstance(camera, (int, np.integer)) and camera >= 0:
            cam.type = mujoco.mjtCamera.mjCAMERA_FIXED
            cam.fixedcamid = int(camera)
        option = scene_option if scene_option is not None else self._option
        mujoco.mjv_updateScene(
            self._model,
            data,
            option,
            None,
            cam,
            mujoco.mjtCatBit.mjCAT_ALL.value,
            self._scene,
        )

    def render(self) -> np.ndarray:
        eye, right, up, fwd, frustum = self._mono_camera()
        self._last_frustum = frustum  # consumed by _rasterize's _to_screen calls
        patches = self._project_geoms(eye, right, up, fwd, frustum)
        return self._rasterize(patches)

    def close(self) -> None:
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = None

    # -- camera ----------------------------------------------------------------

    def _mono_camera(self):
        """Average the stereo mjvGLCamera pair into one mono eye + frustum
        (pos, forward, up, and frustum fields all averaged across both eyes,
        mirroring MuJoCo's own mono-camera reduction)."""
        c0, c1 = self._scene.camera[0], self._scene.camera[1]
        eye = (np.array(c0.pos) + np.array(c1.pos)) / 2
        fwd = (
            np.array(c0.forward, dtype=np.float64)
            + np.array(c1.forward, dtype=np.float64)
        ) / 2
        fwd /= np.linalg.norm(fwd)
        up = (
            np.array(c0.up, dtype=np.float64) + np.array(c1.up, dtype=np.float64)
        ) / 2
        up -= fwd * (up @ fwd)
        up /= np.linalg.norm(up)
        right = np.cross(fwd, up)
        near = (float(c0.frustum_near) + float(c1.frustum_near)) / 2
        top = (float(c0.frustum_top) + float(c1.frustum_top)) / 2
        bottom = (float(c0.frustum_bottom) + float(c1.frustum_bottom)) / 2
        half_h = (top - bottom) / 2
        cy = (top + bottom) / 2
        half_w = half_h * self.width / self.height
        cx = (float(c0.frustum_center) + float(c1.frustum_center)) / 2
        return eye, right, up, fwd, (near, half_w, half_h, cx, cy)

    def _to_screen(self, pts_cam: np.ndarray, frustum) -> np.ndarray:
        """Camera-space points (N,3: x=right,y=up,z=depth) -> pixel coords."""
        near, half_w, half_h, cx, cy = frustum
        z = np.maximum(pts_cam[:, 2], near * 1.0001)
        xn = pts_cam[:, 0] * near / z
        yn = pts_cam[:, 1] * near / z
        u = (xn - (cx - half_w)) / (2 * half_w) * self.width
        v = (1 - (yn - (cy - half_h)) / (2 * half_h)) * self.height
        return np.stack([u, v], axis=-1)

    # -- geometry --------------------------------------------------------------

    def _project_geoms(self, eye, right, up, fwd, frustum):
        """Per-geom 2-D primitives, painter-sorted far-to-near."""
        near, half_w, _, _, _ = frustum
        px_per_unit = self.width / (2 * half_w)  # at the near plane

        def cam_space(p3):
            d = np.atleast_2d(p3) - eye
            return np.stack([d @ right, d @ up, d @ fwd], axis=-1)

        items = []  # (depth, kind, payload, rgba)
        scn = self._scene
        for i in range(scn.ngeom):
            g = scn.geoms[i]
            rgba = np.clip(np.array(g.rgba, dtype=np.float64), 0, 1)
            if rgba[3] < 0.02 or g.type > _MESH:
                continue
            pos = np.array(g.pos, dtype=np.float64)
            mat = np.array(g.mat, dtype=np.float64).reshape(3, 3)
            size = np.array(g.size, dtype=np.float64)
            c = cam_space(pos)[0]
            if g.type == _PLANE:
                # backdrop: a large quad in the plane, clipped by projection
                ext = 20.0 if size[0] == 0 else float(size[0])
                corners = pos + (
                    _BOX_CORNERS[::2, :2] @ np.array([mat[:, 0], mat[:, 1]]) * ext
                )
                cc = _clip_points_near(cam_space(corners), near)
                if len(cc) < 3:
                    continue
                items.append((1e9, "hull", cc, rgba))
                continue
            if c[2] <= near:
                continue
            depth = c[2]
            if g.type in (_SPHERE, _ELLIPSOID):
                r = float(np.mean(size[: (1 if g.type == _SPHERE else 3)]))
                r_px = r * near / depth * px_per_unit
                items.append((depth, "disc", (c, r_px), rgba))
            elif g.type in (_CAPSULE, _CYLINDER):
                axis = mat[:, 2] * size[2]
                ends = cam_space(np.stack([pos - axis, pos + axis]))
                if np.all(ends[:, 2] <= near):
                    continue
                ends[:, 2] = np.maximum(ends[:, 2], near * 1.0001)
                r_px = size[0] * near / depth * px_per_unit
                items.append((depth, "stadium", (ends, r_px), rgba))
            else:  # BOX, MESH, HFIELD: silhouette hull of bounding corners
                half = np.where(size > 0, size, 1e-3)
                corners = pos + (_BOX_CORNERS * half) @ mat.T
                cc = _clip_points_near(cam_space(corners), near)
                if len(cc) < 3:
                    continue
                items.append((depth, "hull", cc, rgba))
        items.sort(key=lambda it: -it[0])
        return [(kind, payload, rgba) for _, kind, payload, rgba in items]

    # -- rasterization -----------------------------------------------------------

    def _rasterize(self, items) -> np.ndarray:
        import matplotlib

        matplotlib.use("Agg", force=False)
        from matplotlib import patches as mpatches
        from matplotlib import pyplot as plt

        dpi = 100.0
        if self._fig is None:
            self._fig = plt.figure(
                figsize=(self.width / dpi, self.height / dpi), dpi=dpi
            )
            self._ax = self._fig.add_axes([0, 0, 1, 1])
        ax = self._ax
        ax.clear()
        ax.set_xlim(0, self.width)
        ax.set_ylim(self.height, 0)
        ax.set_axis_off()
        ax.set_facecolor("white")

        for kind, payload, rgba in items:
            color = tuple(rgba[:3])
            alpha = float(rgba[3])
            if kind == "disc":
                c, r_px = payload
                uv = self._to_screen(c[None], self._last_frustum)[0]
                ax.add_patch(
                    mpatches.Circle(uv, max(r_px, 0.5), color=color, alpha=alpha, lw=0)
                )
            elif kind == "stadium":
                ends, r_px = payload
                uv = self._to_screen(ends, self._last_frustum)
                lw_pts = max(2 * r_px, 1.0) * 72.0 / 100.0
                ax.plot(
                    uv[:, 0],
                    uv[:, 1],
                    color=color,
                    alpha=alpha,
                    linewidth=lw_pts,
                    solid_capstyle="round",
                )
            else:  # hull
                cc = payload
                uv = self._to_screen(cc, self._last_frustum)
                hull = _convex_hull_2d(uv)
                if len(hull) >= 3:
                    ax.add_patch(
                        mpatches.Polygon(hull, closed=True, color=color, alpha=alpha, lw=0)
                    )

        self._fig.canvas.draw()
        buf = np.asarray(self._fig.canvas.buffer_rgba())
        return buf[:, :, :3].copy()
