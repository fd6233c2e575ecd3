"""At the violent reset state: compare ours vs C at iterations 4 and 100,
scoring every qacc candidate on C's own constraint objective
(mj_constraintUpdate at the C state)."""
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

state = jax.jit(env.reset)(jax.random.PRNGKey(0))
data0 = state.pipeline_state
qpos = np.asarray(data0.qpos, np.float64)
qvel = np.asarray(data0.qvel, np.float64)

# contact details at this state
mdbg = mujoco.MjData(m)
mdbg.qpos[:] = qpos; mdbg.qvel[:] = qvel
mujoco.mj_forward(m, mdbg)
print("contacts:", mdbg.ncon)
for k in range(mdbg.ncon):
    c = mdbg.contact[k]
    print(f"  geoms=({c.geom1},{c.geom2}) dist={c.dist:.6f} "
          f"includemargin={c.includemargin:.5f} dim={c.dim}")

def c_qacc(iters):
    mm = copy.copy(m)
    mm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    mm.opt.iterations = iters
    mm.opt.ls_iterations = max(iters, 4) if iters < 50 else 50
    md = mujoco.MjData(mm)
    md.qpos[:] = qpos; md.qvel[:] = qvel; md.ctrl[:] = 0
    mujoco.mj_forward(mm, md)
    return md.qacc.copy()

def ours_qacc(iters):
    mm = copy.copy(m)
    mm.opt.iterations = iters
    mm.opt.ls_iterations = max(iters, 4) if iters < 50 else 50
    plan, model = pm.put_model(mm)
    d = pm.make_data(plan, model)
    d = d.replace(qpos=jp.asarray(qpos, jp.float32),
                  qvel=jp.asarray(qvel, jp.float32),
                  ctrl=jp.zeros(plan.nu))
    d = jax.jit(lambda dd: pf.forward(plan, model, dd))(d)
    return np.asarray(d.qacc, np.float64)

# C objective at this state for a candidate qacc
def c_cost(qacc):
    md = mujoco.MjData(m)
    md.qpos[:] = qpos; md.qvel[:] = qvel; md.ctrl[:] = 0
    mujoco.mj_forward(m, md)
    cost = np.zeros(1)
    jar = np.zeros(md.nefc)
    mujoco.mj_mulJacVec(m, md, jar, np.asarray(qacc))
    jar -= md.efc_aref
    mujoco.mj_constraintUpdate(m, md, jar, cost, 0)
    dx = np.asarray(qacc) - md.qacc_smooth
    qm = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, md, qm)
    gauss = 0.5 * dx @ qm @ dx
    return float(cost[0] + gauss)

for iters in (4, 100):
    qa_c = c_qacc(iters)
    qa_o = ours_qacc(iters)
    print(f"iters={iters}: |qacc|max C={np.abs(qa_c).max():.4g} "
          f"ours={np.abs(qa_o).max():.4g} "
          f"cost C={c_cost(qa_c):.6g} ours={c_cost(qa_o):.6g}")
qa_truth = c_qacc(300)
print("truth(300): |qacc|max", np.abs(qa_truth).max(), "cost", c_cost(qa_truth))
print("dof21: truth", qa_truth[21], " C4", c_qacc(4)[21], " ours4", ours_qacc(4)[21])

# --- row-level comparison at this state ---
from track_mjx_tpu.physics import solver as slv
mm = copy.copy(m)
mm.opt.iterations = 100
mm.opt.ls_iterations = 50
plan, model = pm.put_model(mm)
d = pm.make_data(plan, model)
d = d.replace(qpos=jp.asarray(qpos, jp.float32),
              qvel=jp.asarray(qvel, jp.float32), ctrl=jp.zeros(plan.nu))
d, efc = jax.jit(lambda dd: pf.fwd_position(plan, model, dd))(d)
md = mujoco.MjData(m)
md.qpos[:] = qpos; md.qvel[:] = qvel; md.ctrl[:] = 0
mujoco.mj_forward(m, md)
print("\nC nefc:", md.nefc, " ours nefc:", plan.nefc, " ncon_ell:", plan.ncon_ell)
print("C efc types:", md.efc_type[:md.nefc])
ns = plan.nefc - 3 * plan.ncon_ell
our_aref = np.asarray(efc.aref)
our_D = np.asarray(efc.D)
# match C contact rows to ours by efc address order
print("C contact aref:", md.efc_aref[md.nefc-3*md.ncon:md.nefc] if md.ncon else [])
print("ours ell aref (last 3*ncon_ell):", our_aref[ns:])
print("C contact D:", md.efc_D[md.nefc-3*md.ncon:md.nefc] if md.ncon else [])
print("ours ell D:", our_D[ns:])
# our active scalar rows
print("ours scalar aref range:", our_aref[:ns].min(), our_aref[:ns].max())
