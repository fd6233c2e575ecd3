"""Diagnose why fly episodes terminate at step 1.

Builds the fly tracking env exactly as train.py does (synthetic clips),
resets, steps with zero actions, and prints qpos/qvel magnitudes per step
alongside a MuJoCo C simulation from the same initial state.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jp
import numpy as np
import mujoco
import yaml

from track_mjx_tpu.envs.walker.fly import Fly
from track_mjx_tpu.io.synthetic import synthesize_clips
from track_mjx_tpu.envs.task import tracking
from track_mjx_tpu.envs.task.reward import RewardConfig
import track_mjx_tpu


def main():
    cfg_path = os.path.join(
        os.path.dirname(track_mjx_tpu.__file__), "config", "fly-mc-intention.yaml"
    )
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)

    env_cfg = cfg["env_config"]
    walker_cfg = cfg["walker_config"]
    walker = Fly(
        joint_names=walker_cfg["joint_names"],
        body_names=walker_cfg["body_names"],
        end_eff_names=walker_cfg["end_eff_names"],
        torque_actuators=walker_cfg["torque_actuators"],
        rescale_factor=walker_cfg["rescale_factor"],
    )
    mj_model = walker._mj_model
    print(
        f"nq={mj_model.nq} nv={mj_model.nv} nu={mj_model.nu} "
        f"timestep={mj_model.opt.timestep} cone={mj_model.opt.cone} "
        f"solver={mj_model.opt.solver} iters={mj_model.opt.iterations} "
        f"ls={mj_model.opt.ls_iterations}"
    )
    print(f"qpos0 root: {mj_model.qpos0[:7]}")
    print(f"gravity={mj_model.opt.gravity} density={mj_model.opt.density} "
          f"viscosity={mj_model.opt.viscosity}")

    env_args = dict(env_cfg["env_args"])
    ref_cfg = cfg["reference_config"]
    clips = synthesize_clips(
        mj_model,
        n_clips=2,
        n_frames=int(ref_cfg["clip_length"]),
        mocap_hz=float(env_args["mocap_hz"]),
        seed=0,
    )
    print("clip position[0,0]:", np.asarray(clips.position[0, 0]))
    print("clip quaternion[0,0]:", np.asarray(clips.quaternion[0, 0]))

    rw = dict(env_cfg["reward_weights"])
    rw["healthy_z_range"] = tuple(rw["healthy_z_range"])
    env = tracking.MultiClipTracking(
        reference_clip=clips,
        walker=walker,
        reward_config=RewardConfig(**rw),
        **env_args,
        **ref_cfg,
    )

    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    d = state.pipeline_state
    print("\n== after reset ==")
    print("qpos[:7]:", np.asarray(d.qpos[:7]))
    print("|qvel|max:", float(jp.max(jp.abs(d.qvel))))
    print("start_frame:", int(state.info["start_frame"]))

    mjd = mujoco.MjData(mj_model)
    mjd.qpos[:] = np.asarray(d.qpos)
    mjd.qvel[:] = np.asarray(d.qvel)

    print("ctrlrange[:5]:", mj_model.actuator_ctrlrange[:5])
    print("actuator_forcerange[:3]:", mj_model.actuator_forcerange[:3])
    step = jax.jit(env.step)
    arng = jax.random.PRNGKey(42)
    for i in range(5):
        arng, k = jax.random.split(arng)
        act = jp.tanh(jax.random.normal(k, (env.action_size,)))
        state = step(state, act)
        dd = state.pipeline_state
        mjd.ctrl[:] = np.asarray(act)
        for _ in range(int(env_args["physics_steps_per_control_step"])):
            mujoco.mj_step(mj_model, mjd)
        print(
            f"\n-- control step {i+1} --\n"
            f" ours qpos[:7]={np.asarray(dd.qpos[:7])}\n"
            f"    C qpos[:7]={mjd.qpos[:7]}\n"
            f" ours |qvel|max={float(jp.max(jp.abs(dd.qvel))):.4g}"
            f"  C |qvel|max={np.max(np.abs(mjd.qvel)):.4g}\n"
            f" done={float(state.done)} fall={float(state.metrics['fall'])}"
            f" bad_quat={float(state.metrics['bad_quat'])}"
            f" too_far={float(state.metrics['too_far'])}"
            f" quat_dist={float(state.metrics['quat_distance']):.4g}"
            f" pos_dist={float(state.metrics['summed_pos_distance']):.4g}"
            f" joint_dist={float(state.metrics['joint_distance']):.4g}"
        )


if __name__ == "__main__":
    main()
