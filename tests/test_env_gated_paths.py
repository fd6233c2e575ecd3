"""Environment-gated smoke guards for the GL renderer and real-wandb paths.

VERDICT r4 #10: both paths are implemented but this rig has neither a GL
backend nor the wandb package, so ordinary tests would skip forever — and a
breakage would surface only on a user's machine. These tests run WHENEVER the
capability is present and fail loudly if the path is broken; they skip (with
the capability named) only when the capability itself is absent.
"""

import numpy as np
import pytest

from helpers import make_toy_env  # noqa: F401  (ensures assets resolvable)


# ---------------------------------------------------------------------------
# GL renderer (reference: track_mjx/analysis/render.py:122-179 uses
# mujoco.Renderer through a GL backend; our make_renderer falls back to the
# software rasterizer when GL is absent)
# ---------------------------------------------------------------------------


def test_gl_renderer_renders_frame_when_gl_present():
    from track_mjx_tpu.analysis.render import _make_renderer, gl_available

    if not gl_available():
        pytest.skip("no GL backend on this host (software path covered by "
                    "tests/test_software_render.py)")
    import mujoco

    from track_mjx_tpu.envs.walker.rodent import Rodent
    from track_mjx_tpu.utils.config import load_config

    cfg = load_config("rodent-full-clips")
    w = cfg.walker_config
    walker = Rodent(
        list(w.joint_names), list(w.body_names), list(w.end_eff_names),
        torque_actuators=w.torque_actuators,
        rescale_factor=w.rescale_factor,
    )
    m = walker._mj_model
    renderer = _make_renderer(m, height=64, width=64)
    assert isinstance(renderer, mujoco.Renderer), (
        "GL is available but _make_renderer fell back to the software path"
    )
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    renderer.update_scene(d)
    frame = renderer.render()
    renderer.close()
    assert frame.shape == (64, 64, 3)
    assert frame.dtype == np.uint8
    assert int(frame.max()) > 0, "GL renderer produced an all-black frame"


# ---------------------------------------------------------------------------
# real wandb (reference: track_mjx/agent/wandb_logging.py:30-171; our
# utils/wandb_compat.py shims it to JSONL when the package is absent)
# ---------------------------------------------------------------------------


def test_real_wandb_logging_when_package_present(tmp_path, monkeypatch):
    from track_mjx_tpu.utils import wandb_compat

    if not wandb_compat.USING_REAL_WANDB:
        pytest.skip("wandb package not installed (JSONL shim covered by the "
                    "logging tests)")
    # offline mode: exercise the real wandb client end-to-end without a
    # network or an API key
    monkeypatch.setenv("WANDB_MODE", "offline")
    monkeypatch.setenv("WANDB_DIR", str(tmp_path))
    wandb = wandb_compat.wandb
    run = wandb.init(project="track_mjx_tpu_smoke", dir=str(tmp_path))
    try:
        wandb.log({"smoke/metric": 1.0}, step=1)
        table = wandb.Table(data=[[0, 0.0], [1, 1.0]], columns=["x", "y"])
        wandb.log({"smoke/plot": wandb.plot.line(table, "x", "y", title="t")})
    finally:
        wandb.finish()
    run_dirs = list(tmp_path.rglob("*.wandb"))
    assert run_dirs, "real wandb run produced no offline run file"
