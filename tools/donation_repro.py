"""Isolate the TPU device fault seen with buffer donation + Pallas kernels.

Round-1 observation: jitting the training epoch with donate_argnums=(0,1)
produced TPU device faults mid-epoch once the Pallas linalg kernels were in
the physics path (ROUND_NOTES.md item 2). This script bisects the
interaction, smallest surface first:

  1. bare kernel:   jit(scan(cholesky/solve)) with donated operands
  2. physics step:  jit(vmap(n_step)) with donated batched Data carry
  3. env rollout:   jit(scan(wrapped env.step)) with donated State carry

Usage: python tools/donation_repro.py [level] [iters]
"""

from __future__ import annotations

import sys
import time

import jax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

import jax.numpy as jnp


def _build_env():
    from track_mjx_tpu.envs.task.reward import RewardConfig
    from track_mjx_tpu.envs.task.tracking import MultiClipTracking
    from track_mjx_tpu.envs.walker.rodent import Rodent
    from track_mjx_tpu.io.synthetic import synthesize_clips
    from track_mjx_tpu.utils.config import load_config

    cfg = load_config("rodent-full-clips")
    walker = Rodent(
        joint_names=cfg.walker_config.joint_names,
        body_names=cfg.walker_config.body_names,
        end_eff_names=cfg.walker_config.end_eff_names,
        torque_actuators=cfg.walker_config.torque_actuators,
        rescale_factor=cfg.walker_config.rescale_factor,
    )
    clips = synthesize_clips(walker._mj_model, n_clips=2, n_frames=250)
    rewards = dict(cfg.env_config.reward_weights)
    rewards["healthy_z_range"] = tuple(rewards["healthy_z_range"])
    return MultiClipTracking(
        reference_clip=clips,
        walker=walker,
        reward_config=RewardConfig(**rewards),
        **dict(cfg.env_config.env_args),
        **dict(cfg.reference_config),
    )


def level1_bare_kernel(iters: int):
    """Donated operands feeding the lane-batched Cholesky/solve kernels."""
    from track_mjx_tpu.ops import batched_linalg as bl

    n, batch = 73, 1024
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (batch, n, n), jnp.float32)
    spd = a @ jnp.swapaxes(a, -1, -2) + 10.0 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, n), jnp.float32)

    def run(spd, b):
        def body(carry, _):
            spd, b = carry
            l = jax.vmap(bl.cholesky)(spd)
            x = jax.vmap(bl.cho_solve)(l, b)
            # feed results back so donation actually recycles buffers
            spd = spd + 1e-6 * x[..., None] * x[..., None, :]
            return (spd, b + 1e-6 * x), x.sum()

        (spd, b), s = jax.lax.scan(body, (spd, b), None, length=20)
        return spd, b, s.sum()

    donated = jax.jit(run, donate_argnums=(0, 1))
    spd, b, s = donated(spd, b)
    jax.block_until_ready(s)
    print("level1 compile ok", flush=True)
    for i in range(iters):
        spd, b, s = donated(spd, b)
        jax.block_until_ready(s)
        if i % 10 == 0:
            print(f"level1 iter {i}: sum={float(s):.4f}", flush=True)
    print("level1 PASS (no device fault)")


def level2_physics(iters: int):
    """Donated batched Data carry through n_step (fused CG kernel inside)."""
    from track_mjx_tpu.physics import forward as fwd

    env = _build_env()
    plan, model = env.plan, env.model
    batch = 1024
    qpos = jnp.tile(jnp.asarray(env._mj_model.qpos0)[None], (batch, 1))
    qvel = jnp.zeros((batch, plan.nv))
    data = jax.jit(jax.vmap(env.pipeline_init))(qpos, qvel)
    ctrl = jnp.zeros((batch, plan.nu))

    def stepn(data, ctrl):
        data = jax.vmap(lambda d, c: fwd.n_step(plan, model, d.replace(ctrl=c), 10))(
            data, ctrl
        )
        return data, data.qpos.sum()

    donated = jax.jit(stepn, donate_argnums=(0,))
    data, s = donated(data, ctrl)
    jax.block_until_ready(s)
    print("level2 compile ok", flush=True)
    for i in range(iters):
        data, s = donated(data, ctrl)
        jax.block_until_ready(s)
        if i % 10 == 0:
            print(f"level2 iter {i}: qpos_sum={float(s):.4f}", flush=True)
    print("level2 PASS (no device fault)")


def level3_rollout(iters: int):
    """Donated wrapper State carry through the full env.step scan."""
    from track_mjx_tpu.envs import wrappers

    env = _build_env()
    wrapped = wrappers.wrap(env, episode_length=195, action_repeat=1, use_lstm=False)
    batch = 1024
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state = jax.jit(wrapped.reset)(keys)

    def run(state, key):
        def body(carry, _):
            st, k = carry
            k, ak = jax.random.split(k)
            action = jax.random.uniform(
                ak, (batch, env.action_size), minval=-1.0, maxval=1.0
            )
            st = wrapped.step(st, action)
            return (st, k), st.reward.sum()

        (state, _), r = jax.lax.scan(body, (state, key), None, length=20)
        return state, r.sum()

    donated = jax.jit(run, donate_argnums=(0,))
    state, r = donated(state, jax.random.PRNGKey(1))
    jax.block_until_ready(r)
    print("level3 compile ok", flush=True)
    for i in range(iters):
        state, r = donated(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(r)
        if i % 10 == 0:
            print(f"level3 iter {i}: reward_sum={float(r):.2f}", flush=True)
    print("level3 PASS (no device fault)")


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    t0 = time.time()
    {1: level1_bare_kernel, 2: level2_physics, 3: level3_rollout}[level](iters)
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
