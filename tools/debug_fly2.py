"""Zero-action fly stability: ours vs MuJoCo C with warmstart DISABLED
(apples-to-apples at cg/4/4), on the exact test scenario."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, yaml, mujoco
import jax.numpy as jp
import numpy as np
import track_mjx_tpu
from track_mjx_tpu.envs.task import tracking
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.walker.fly import Fly
from track_mjx_tpu.io.synthetic import synthesize_clips

cfg = yaml.safe_load(open(os.path.join(
    os.path.dirname(track_mjx_tpu.__file__), "config", "fly-mc-intention.yaml")))
w = cfg["walker_config"]
walker = Fly(joint_names=w["joint_names"], body_names=w["body_names"],
             end_eff_names=w["end_eff_names"],
             torque_actuators=w["torque_actuators"],
             rescale_factor=w["rescale_factor"])
env_args = dict(cfg["env_config"]["env_args"])
clips = synthesize_clips(walker._mj_model, n_clips=1, n_frames=100,
                         mocap_hz=float(env_args["mocap_hz"]), seed=0)
rw = dict(cfg["env_config"]["reward_weights"])
rw["healthy_z_range"] = tuple(rw["healthy_z_range"])
env = tracking.MultiClipTracking(
    reference_clip=clips, walker=walker, reward_config=RewardConfig(**rw),
    **env_args, clip_length=100, random_init_range=10, traj_length=5)
m = walker._mj_model  # mutated by env ctor: cg/4/4, dt=2e-4

state = jax.jit(env.reset)(jax.random.PRNGKey(0))
d = state.pipeline_state
print("reset qpos[:7]:", np.asarray(d.qpos[:7]))
print("reset |qvel|max:", float(jp.max(jp.abs(d.qvel))),
      "start_frame:", int(state.info["start_frame"]))

def run_c(disable_warmstart):
    import copy
    mm = copy.copy(m)
    if disable_warmstart:
        mm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    md = mujoco.MjData(mm)
    md.qpos[:] = np.asarray(d.qpos); md.qvel[:] = np.asarray(d.qvel)
    traj = []
    for i in range(10):
        md.ctrl[:] = 0.0
        for _ in range(10):
            mujoco.mj_step(mm, md)
        traj.append((md.qpos[:7].copy(), np.abs(md.qvel).max()))
    return traj

c_warm = run_c(False)
c_nowarm = run_c(True)

step = jax.jit(env.step)
zero = jp.zeros(env.action_size)
st = state
for i in range(10):
    st = step(st, zero)
    dd = st.pipeline_state
    print(f"step {i+1}: ours quat_dist={float(st.metrics['quat_distance']):.4f}"
          f" joint={float(st.metrics['joint_distance']):.3f}"
          f" done={float(st.done)}"
          f" |qvel|max={float(jp.max(jp.abs(dd.qvel))):.3g}")
    print(f"   ours quat={np.asarray(dd.qpos[3:7]).round(4)}")
    print(f"  Cwarm quat={c_warm[i][0][3:7].round(4)} |qvel|max={c_warm[i][1]:.3g}")
    print(f"  Cnowm quat={c_nowarm[i][0][3:7].round(4)} |qvel|max={c_nowarm[i][1]:.3g}")
