"""Offline rendering: ghost-pair models, rollout videos, PCA intention viz.

Equivalent capability to track_mjx/analysis/render.py (ghost-pair rollout
videos with the same visual conventions: translucent ghost at a -0.2 m x
offset, red "-0" tracking sites, CG 6/6 playback model, 512x512 default
renderer), restructured around a per-walker ``WalkerRenderSpec`` registry
and a spec-assembly pipeline (_load_scaled_spec -> attach_ghost -> compile).
Also: ``render_rollout`` (frames from saved qposes, realtime fps =
(1/timestep)/physics_steps_per_control_step), ``plot_pca_intention_video``
(reference :243-372, with its undefined-`pca_embedded` bug fixed), and the
``display_video`` notebook helper.

Framework difference: mujoco.Renderer needs a GL backend; when none is
available (headless TPU hosts without osmesa/EGL), ``_make_renderer`` falls
back to the CPU ``SoftwareRenderer`` (same update_scene/render API), so a
renderer is always returned and video logging works everywhere.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import mujoco
import numpy as np

from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
from track_mjx_tpu.envs.walker.spec_utils import recolour_tree

# visual conventions shared with the reference implementation
GHOST_OFFSET = (-0.2, 0.0, 0.0)
GHOST_RGBA = (0.8, 0.8, 0.8, 0.2)
TRACKING_SITE_TAG = "-0"  # site-name substring marking mocap tracking sites
TRACKING_SITE_RGBA = (1.0, 0.0, 0.0, 1.0)


def _fly_xml_path() -> str:
    # the fly checkout is missing 6 meshes (MISSING_LARGE_BLOBS); the walker
    # builds from a patched copy with generated placeholders — rendering must
    # use the same copy or MjSpec.compile fails on the missing .obj files
    from track_mjx_tpu.envs.walker.fly import ensure_fly_assets

    return str(Path(ensure_fly_assets(DEFAULT_ASSET_ROOT)) / "fruitfly_force_fast.xml")


@dataclasses.dataclass(frozen=True)
class WalkerRenderSpec:
    """How to rebuild a walker's playback model for offline rendering."""

    xml_path: Callable[[], str]  # lazy: fly assets are materialized on demand
    root_body: str  # body the ghost copy is attached by


RENDER_SPECS: Dict[str, WalkerRenderSpec] = {
    "rodent": WalkerRenderSpec(
        lambda: str(Path(DEFAULT_ASSET_ROOT) / "rodent/rodent.xml"), "walker"
    ),
    "fly": WalkerRenderSpec(_fly_xml_path, "thorax"),
    "stick": WalkerRenderSpec(
        lambda: str(Path(DEFAULT_ASSET_ROOT) / "stick/sungaya_inexpectata_box.xml"),
        "reference_base",
    ),
}


def _scale_body_tree(body, s: float) -> None:
    """Recursively scales pos/size/fromto on a body subtree (render-side
    variant that also scales sites/joints, matching the reference's
    _scale_body_tree used by its renderer path)."""
    if body.pos is not None:
        body.pos = body.pos * s
    for geom in body.geoms:
        if geom.pos is not None:
            geom.pos = geom.pos * s
        geom.size = geom.size * s
        geom.fromto = geom.fromto * s
    for site in body.sites:
        if site.pos is not None:
            site.pos = site.pos * s
        site.size = site.size * s
    for joint in body.joints:
        if joint.pos is not None:
            joint.pos = joint.pos * s
    for child in body.bodies:
        _scale_body_tree(child, s)


def _load_scaled_spec(xml_path: str, scale: float) -> mujoco.MjSpec:
    spec = mujoco.MjSpec.from_file(xml_path)
    if scale != 1.0:
        for top in spec.worldbody.bodies:
            _scale_body_tree(top, scale)
    return spec


def attach_ghost(spec: mujoco.MjSpec, root_body_name: str) -> None:
    """Adds a translucent copy of the walker (prefix "ghost") to `spec`,
    offset by GHOST_OFFSET, for rollout-vs-reference playback."""
    ghost = spec.copy()
    for top in ghost.worldbody.bodies:
        recolour_tree(top, rgba=list(GHOST_RGBA))
    frame = spec.worldbody.add_frame(pos=list(GHOST_OFFSET), quat=[0, 0, 0, 0])
    frame.attach_body(ghost.body(root_body_name), "", "ghost")


def make_ghost_pair(
    xml_path: str, *, scale: float = 1.0, root_body_name: str = "root"
) -> Tuple[mujoco.MjSpec, mujoco.MjModel, str]:
    """Builds a combined model: the walker plus a translucent ghost copy."""
    spec = _load_scaled_spec(xml_path, scale)
    attach_ghost(spec, root_body_name)
    model = spec.compile()
    return spec, model, spec.to_xml()


def _mp4_writable() -> bool:
    """True when imageio has an mp4 backend (ffmpeg) available."""
    try:
        import imageio_ffmpeg  # noqa: F401

        return True
    except ImportError:
        return False


_GL_AVAILABLE: Optional[bool] = None


def gl_available() -> bool:
    """True when a MuJoCo-usable GL context can be created.

    Probed in a SUBPROCESS: on hosts without any GL platform library,
    constructing ``mujoco.Renderer`` can abort the interpreter outright
    (glfw SIGABRT) rather than raise, so an in-process try/except is unsafe.
    The result is cached for the process lifetime."""
    global _GL_AVAILABLE
    if _GL_AVAILABLE is None:
        import subprocess
        import sys

        probe = (
            "import mujoco;"
            "m=mujoco.MjModel.from_xml_string("
            "\"<mujoco><worldbody><geom type='sphere' size='0.1'/>"
            "</worldbody></mujoco>\");"
            "r=mujoco.Renderer(m,16,16);r.close()"
        )
        try:
            _GL_AVAILABLE = (
                subprocess.run(
                    [sys.executable, "-c", probe],
                    capture_output=True,
                    timeout=60,
                ).returncode
                == 0
            )
        except Exception:
            _GL_AVAILABLE = False
    return _GL_AVAILABLE


def build_playback_model(
    walker_name: str, rescale_factor: float, render_ghost: bool = True
) -> mujoco.MjModel:
    """Compiles the playback model (walker [+ ghost]) for a walker type,
    configured for kinematic replay: CG 6/6 (the playback mj_forward never
    needs the training model's solver settings) and red tracking sites."""
    try:
        spec_info = RENDER_SPECS[walker_name]
    except KeyError:
        raise ValueError(f"Unknown walker_name: {walker_name}")
    spec = _load_scaled_spec(spec_info.xml_path(), rescale_factor)
    if render_ghost:
        attach_ghost(spec, spec_info.root_body)
    mj_model = spec.compile()
    mj_model.opt.solver = mujoco.mjtSolver.mjSOL_CG
    mj_model.opt.iterations = 6
    mj_model.opt.ls_iterations = 6
    for i in range(mj_model.nsite):
        if TRACKING_SITE_TAG in mj_model.site(i).name:
            mj_model.site(i).rgba = list(TRACKING_SITE_RGBA)
    return mj_model


def make_rollout_renderer(
    cfg: Any, render_ghost: bool = True
) -> Tuple[Any, mujoco.MjModel, mujoco.MjData, mujoco.MjvOption]:
    """Creates (renderer, model, data, scene options) for rollouts. The
    renderer is a ``mujoco.Renderer`` when GL exists, else the software
    rasterizer — never None."""
    mj_model = build_playback_model(
        cfg["env_config"]["walker_name"],
        cfg["walker_config"]["rescale_factor"],
        render_ghost,
    )
    mj_data = mujoco.MjData(mj_model)

    scene_option = mujoco.MjvOption()
    scene_option.sitegroup[:] = [1, 1, 1, 1, 1, 0]

    mujoco.mj_kinematics(mj_model, mj_data)
    renderer = _make_renderer(mj_model, 512, 512)
    return renderer, mj_model, mj_data, scene_option


def _make_renderer(mj_model: mujoco.MjModel, height: int, width: int):
    """GL renderer when a context exists, else the software rasterizer.

    The reference is GL-only (track_mjx/analysis/render.py:181-239); on
    headless hosts this framework degrades to ``SoftwareRenderer`` (same
    update_scene/render API, CPU painter's algorithm) so video logging and
    offline rendering still produce frames everywhere."""
    if gl_available():
        return mujoco.Renderer(mj_model, height=height, width=width)
    from track_mjx_tpu.analysis.software_render import SoftwareRenderer

    logging.warning("No GL backend available; using the software rasterizer.")
    return SoftwareRenderer(mj_model, height=height, width=width)


def render_rollout(
    cfg: Any,
    rollout: Dict[str, Any],
    height: int = 480,
    width: int = 640,
    render_ghost: bool = True,
) -> Tuple[List[np.ndarray], float]:
    """Renders frames from saved qposes (rollout ++ ghost reference)."""
    qroll = rollout["qposes_rollout"]
    if not render_ghost:
        qpos_list = qroll
    else:
        qref = rollout["qposes_ref"]
        qpos_list = [np.concatenate((qp, qr)) for qp, qr in zip(qroll, qref)]

    renderer, mj_model, mj_data, scene_option = make_rollout_renderer(
        cfg, render_ghost=render_ghost
    )
    render_fps = (
        1.0 / mj_model.opt.timestep
    ) / cfg["env_config"]["env_args"]["physics_steps_per_control_step"]
    if cfg["env_config"].get("render_fps") is not None:
        render_fps = cfg["env_config"]["render_fps"]

    mujoco.mj_kinematics(mj_model, mj_data)
    if renderer is not None:
        renderer.close()
    renderer = _make_renderer(mj_model, height=height, width=width)

    frames = []
    for qpos in qpos_list:
        mj_data.qpos = qpos
        mujoco.mj_forward(mj_model, mj_data)
        renderer.update_scene(
            mj_data,
            camera=cfg["env_config"]["render_camera_name"],
            scene_option=scene_option,
        )
        frames.append(renderer.render())
    return frames, render_fps


def plot_pca_intention_video(
    intentions: np.ndarray,
    out_path: str,
    fps: int = 25,
    n_components: int = 2,
    trail: int = 50,
) -> str:
    """Writes a video of the PCA-projected intention trajectory progressing
    through time (reference :243-372, simplified and with its undefined
    `pca_embedded` bug fixed — the fitted embedding is computed once here)."""
    import matplotlib

    matplotlib.use("Agg")
    import imageio
    import matplotlib.pyplot as plt
    from sklearn.decomposition import PCA

    intentions = np.asarray(intentions)
    pca = PCA(n_components=n_components)
    embedded = pca.fit_transform(intentions)

    if out_path.endswith(".mp4") and not _mp4_writable():
        out_path = out_path[:-4] + ".gif"
        logging.warning("no mp4 backend (ffmpeg); writing %s instead", out_path)

    frames = []
    fig, ax = plt.subplots(figsize=(5, 5))
    for t in range(len(embedded)):
        ax.clear()
        lo = max(0, t - trail)
        ax.plot(embedded[: t + 1, 0], embedded[: t + 1, 1], alpha=0.3, lw=0.5)
        ax.plot(embedded[lo : t + 1, 0], embedded[lo : t + 1, 1], lw=1.5)
        ax.scatter(embedded[t, 0], embedded[t, 1], c="r", s=20)
        ax.set_xlim(embedded[:, 0].min() - 0.5, embedded[:, 0].max() + 0.5)
        ax.set_ylim(embedded[:, 1].min() - 0.5, embedded[:, 1].max() + 0.5)
        ax.set_title(f"intention PCA (t={t})")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    imageio.mimsave(out_path, frames, fps=fps)
    return out_path


def display_video(frames: List[np.ndarray], fps: int = 30):
    """Renders frames as inline HTML video (notebook helper)."""
    import base64
    import tempfile

    import imageio

    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
        path = f.name
    imageio.mimsave(path, frames, fps=fps)
    with open(path, "rb") as f:
        data = base64.b64encode(f.read()).decode()
    os.unlink(path)
    try:
        from IPython.display import HTML

        return HTML(
            f'<video controls autoplay loop src="data:video/mp4;base64,{data}">'
            "</video>"
        )
    except ImportError:
        return data
