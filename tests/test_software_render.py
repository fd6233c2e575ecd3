"""Software (GL-free) renderer tests — the video path executed end-to-end.

The reference's video rendering (track_mjx/analysis/render.py:181-239) needs
an OpenGL context and so never runs on headless CI; this framework's
``SoftwareRenderer`` rasterizes the mjv abstract scene on CPU, so the full
render_rollout path is exercised here with real frames."""

import mujoco
import numpy as np
import pytest

from track_mjx_tpu.analysis.render import build_playback_model, render_rollout
from track_mjx_tpu.analysis.software_render import SoftwareRenderer, _convex_hull_2d


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]])
    hull = _convex_hull_2d(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (2, 0), (2, 2), (0, 2)}


@pytest.fixture(scope="module")
def simple_model():
    xml = """<mujoco><worldbody>
      <camera name='front' pos='0 -1 0.2' xyaxes='1 0 0 0 0 1'/>
      <geom type='plane' size='2 2 .1' rgba='.9 .9 .9 1'/>
      <body pos='0 0 .2'>
        <geom name='ball' type='sphere' size='.1' rgba='1 0 0 1'/>
      </body>
    </worldbody></mujoco>"""
    return mujoco.MjModel.from_xml_string(xml)


class TestSoftwareRenderer:
    def test_sphere_projects_to_center(self, simple_model):
        m = simple_model
        d = mujoco.MjData(m)
        mujoco.mj_forward(m, d)
        r = SoftwareRenderer(m, height=96, width=128)
        r.update_scene(d, camera="front")
        frame = r.render()
        assert frame.shape == (96, 128, 3) and frame.dtype == np.uint8
        # the red sphere sits on the camera axis: red pixels near image center
        red = (frame[:, :, 0] > 180) & (frame[:, :, 1] < 120) & (frame[:, :, 2] < 120)
        assert red.sum() > 10
        ys, xs = np.nonzero(red)
        assert abs(xs.mean() - 64) < 8 and abs(ys.mean() - 48) < 10
        r.close()

    def test_motion_changes_frames(self, simple_model):
        m = simple_model
        d = mujoco.MjData(m)
        r = SoftwareRenderer(m, height=64, width=64)
        orig_x = float(m.body_pos[1, 0])
        try:
            frames = []
            for x in (0.0, 0.15):
                m.body_pos[1, 0] = x
                mujoco.mj_forward(m, d)
                r.update_scene(d, camera="front")
                frames.append(r.render())
            assert not np.array_equal(frames[0], frames[1])
        finally:
            # simple_model is module-scoped: restore to keep tests order-free
            m.body_pos[1, 0] = orig_x
            r.close()

    def test_unknown_camera_raises(self, simple_model):
        r = SoftwareRenderer(simple_model, 32, 32)
        d = mujoco.MjData(simple_model)
        mujoco.mj_forward(simple_model, d)
        with pytest.raises(ValueError):
            r.update_scene(d, camera="nope")
        r.close()


class TestRenderRolloutSoftware:
    def test_render_rollout_rodent_ghost(self):
        """Full render_rollout on the rodent ghost-pair playback model,
        through the software fallback (no GL on this host)."""
        cfg = {
            "env_config": {
                "walker_name": "rodent",
                "render_camera_name": "close_profile",
                "render_fps": None,
                "env_args": {"physics_steps_per_control_step": 10},
            },
            "walker_config": {"rescale_factor": 0.9},
        }
        single = build_playback_model("rodent", 0.9, render_ghost=False)
        nq = single.nq
        qpos0 = np.array(single.qpos0)
        qposes = [qpos0.copy() for _ in range(3)]
        for i, q in enumerate(qposes):
            q[0] += 0.02 * i  # root x translation between frames
        rollout = {
            "qposes_rollout": qposes,
            "qposes_ref": [q.copy() for q in qposes],
        }
        frames, fps = render_rollout(cfg, rollout, height=120, width=160)
        assert len(frames) == 3
        assert frames[0].shape == (120, 160, 3)
        assert fps == pytest.approx((1.0 / single.opt.timestep) / 10)
        # frames contain actual content and animate
        assert (frames[0] < 250).any(axis=-1).sum() > 50
        assert not np.array_equal(frames[0], frames[2])
