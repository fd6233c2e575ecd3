"""Substep lockstep: at each physics substep, evaluate MuJoCo C forward
(no warmstart) AT OUR STATE and compare qacc + stage outputs. Finds the first
quantity that disagrees."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import copy
import jax, yaml, mujoco
import jax.numpy as jp
import numpy as np
import track_mjx_tpu
from track_mjx_tpu.envs.task import tracking
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.walker.fly import Fly
from track_mjx_tpu.io.synthetic import synthesize_clips
from track_mjx_tpu.physics import forward as pf
from track_mjx_tpu.physics import model as pm

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
m = walker._mj_model
plan, model = env.plan, env.model

state = jax.jit(env.reset)(jax.random.PRNGKey(0))
data = state.pipeline_state

mm = copy.copy(m)
mm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
md = mujoco.MjData(mm)

substep = jax.jit(lambda d: pf.step(plan, model, d.replace(
    ctrl=jp.zeros(plan.nu))))

def c_eval(qpos, qvel):
    md.qpos[:] = qpos; md.qvel[:] = qvel; md.ctrl[:] = 0
    mujoco.mj_forward(mm, md)
    return md

for i in range(12):
    qpos = np.asarray(data.qpos, np.float64)
    qvel = np.asarray(data.qvel, np.float64)
    d_c = c_eval(qpos, qvel)
    nd = substep(data)
    # our forward outputs are already in nd (pre-integration values stale);
    # recompute our forward at the same state for the stage compare
    fdata = jax.jit(lambda d: pf.forward(plan, model, d))(
        data.replace(ctrl=jp.zeros(plan.nu)))
    def rel(a, b):
        a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(1.0, np.abs(b).max())
    print(f"substep {i}: |qvel|max={np.abs(qvel).max():8.3f}"
          f"  ncon(C)={d_c.ncon}"
          f"  qacc rel={rel(fdata.qacc, d_c.qacc):.3e}"
          f"  qacc_smooth rel={rel(fdata.qacc_smooth, d_c.qacc_smooth):.3e}"
          f"  qfrc_passive rel={rel(fdata.qfrc_passive, d_c.qfrc_passive):.3e}"
          f"  qfrc_bias rel={rel(fdata.qfrc_bias, d_c.qfrc_bias):.3e}"
          f"  qfrc_act rel={rel(fdata.qfrc_actuator, d_c.qfrc_actuator):.3e}")
    if i == 0 or rel(fdata.qacc, d_c.qacc) > 0.3:
        qa = np.asarray(fdata.qacc); qc = d_c.qacc
        idx = np.argsort(-np.abs(qa - qc))[:6]
        print("   worst dofs:", [(int(k), round(float(qa[k]),1), round(float(qc[k]),1)) for k in idx])
    data = nd
