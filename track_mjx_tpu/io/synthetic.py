"""Synthetic reference-clip generation.

The reference framework consumes stac-mjx mocap HDF5 files that are not
shipped with the repo; tests and benchmarks need kinematically-consistent
clips generated from the model itself. `synthesize_clips` produces smooth
random joint trajectories (band-limited sinusoids inside the joint ranges,
slow root drift) and fills in body_positions/body_quaternions with the MuJoCo
C forward kinematics, matching the dataset contract of
track_mjx/io/load.py:16-38 (features shaped (clips, frames, dim), velocities
finite-differenced at the mocap rate).
"""

from __future__ import annotations

import jax.numpy as jnp
import mujoco
import numpy as np

from track_mjx_tpu.io.load import ReferenceClip


def synthesize_clips(
    mj_model: mujoco.MjModel,
    n_clips: int = 2,
    n_frames: int = 250,
    mocap_hz: float = 50.0,
    seed: int = 0,
    joint_amplitude: float = 0.2,
    root_speed: float = 0.05,
) -> ReferenceClip:
    """Generates (n_clips, n_frames, ...) kinematically-consistent clips."""
    rng = np.random.RandomState(seed)
    nq = mj_model.nq
    nbody = mj_model.nbody
    data = mujoco.MjData(mj_model)

    qpos_all = np.zeros((n_clips, n_frames, nq))
    # dataset contract (reference io/load.py + single_clip_tracking.py:419-424):
    # body arrays exclude the world body so (ref - xpos[1:]) broadcasts
    xpos_all = np.zeros((n_clips, n_frames, nbody - 1, 3))
    xquat_all = np.zeros((n_clips, n_frames, nbody - 1, 4))

    t = np.arange(n_frames) / mocap_hz
    for c in range(n_clips):
        qpos = np.tile(mj_model.qpos0, (n_frames, 1))
        # slow root drift in the horizontal plane
        heading = rng.uniform(0, 2 * np.pi)
        qpos[:, 0] += root_speed * t * np.cos(heading)
        qpos[:, 1] += root_speed * t * np.sin(heading)
        # band-limited joint motion within ranges
        for j in range(mj_model.njnt):
            if mj_model.jnt_type[j] not in (2, 3):  # slide/hinge only
                continue
            adr = mj_model.jnt_qposadr[j]
            freq = rng.uniform(0.3, 2.0)
            phase = rng.uniform(0, 2 * np.pi)
            amp = joint_amplitude * rng.uniform(0.2, 1.0)
            wave = amp * np.sin(2 * np.pi * freq * t + phase)
            if mj_model.jnt_limited[j]:
                lo, hi = mj_model.jnt_range[j]
                center = qpos[0, adr]
                span = min(center - lo, hi - center)
                wave = np.clip(wave, -0.9 * span, 0.9 * span)
            qpos[:, adr] += wave
        # forward kinematics per frame (host C engine)
        for f in range(n_frames):
            data.qpos[:] = qpos[f]
            mujoco.mj_kinematics(mj_model, data)
            xpos_all[c, f] = data.xpos[1:]
            xquat_all[c, f] = data.xquat[1:]
        qpos_all[c] = qpos

    # velocities by finite difference at the mocap rate
    qvel_all = np.zeros((n_clips, n_frames, mj_model.nv))
    dt = 1.0 / mocap_hz
    # translational + joint velocities (quaternion angular velocity left
    # approximate: world-frame finite-difference of orientation is rarely
    # consumed; the tracking task only reads angular_velocity for an optional
    # reward term)
    qvel_all[:, 1:, :3] = np.diff(qpos_all[:, :, :3], axis=1) / dt
    qvel_all[:, 1:, 6:] = np.diff(qpos_all[:, :, 7:], axis=1) / dt

    return ReferenceClip(
        position=jnp.asarray(qpos_all[:, :, :3], jnp.float32),
        quaternion=jnp.asarray(qpos_all[:, :, 3:7], jnp.float32),
        joints=jnp.asarray(qpos_all[:, :, 7:], jnp.float32),
        body_positions=jnp.asarray(xpos_all, jnp.float32),
        velocity=jnp.asarray(qvel_all[:, :, :3], jnp.float32),
        angular_velocity=jnp.asarray(qvel_all[:, :, 3:6], jnp.float32),
        joints_velocity=jnp.asarray(qvel_all[:, :, 6:], jnp.float32),
        body_quaternions=jnp.asarray(xquat_all, jnp.float32),
    )
