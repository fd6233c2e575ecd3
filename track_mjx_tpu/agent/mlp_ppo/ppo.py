"""PPO trainer for the MLP intention pipeline — pjit/global-array SPMD.

Behavioral parity with the reference trainer (track_mjx/agent/mlp_ppo/ppo.py),
re-architected TPU-first. The reference distributes with
jax.pmap(axis_name="i") + device_put_replicated + psum/pmean (:409,625-627);
here the whole training epoch is ONE jitted SPMD program over a
Mesh(("batch",)): env state is sharded along the env axis, parameters and
normalizer are replicated, and XLA inserts the all-reduces (grad means,
normalizer sums) over ICI. This removes per-device key plumbing, `_unpmap`
host pulls, and the replication invariant maintenance.

Structure preserved from the reference:
- env_step_per_training_step = batch*unroll*minibatches*repeat (:260-262);
- epoch layout: scan(training_step) -> rollout scan of generate_unroll
  (:330-353), normalizer update (+ frozen proprioceptive splice, :363-377),
  scan(sgd_step) -> permute/minibatch scan -> clipped-adam update (:379-384);
- env_steps counted in thousands (:390-393, :54);
- eval on train + optional held-out test split (:683-698, :742-758), render
  callback every render_interval evals (:765-781), Orbax composite save
  (:702-719, :787-795);
- restore modes incl. decoder-freeze transfer with optax mask and pinned
  proprioceptive normalizer slice (:561-618).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from optax.transforms import freeze

from track_mjx_tpu.agent import acting, gradients, network_masks
from track_mjx_tpu.agent import running_statistics
from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.mlp_ppo import losses, ppo_networks
from track_mjx_tpu.envs import wrappers
from track_mjx_tpu.envs.base import Env, State
from track_mjx_tpu.parallel import mesh as mesh_lib

Metrics = types.Metrics
InferenceParams = Tuple[running_statistics.NestedMeanStd, types.Params]
STEPS_IN_THOUSANDS = 1e3


@flax.struct.dataclass
class TrainingState:
    """Learner state (replicated across the mesh)."""

    optimizer_state: optax.OptState
    params: losses.PPONetworkParams
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jnp.ndarray


def _to_host(v):
    """Host-local copy of (replicated) global arrays — pjit analogue of the
    reference's _unpmap (:69-70)."""
    return jax.tree.map(np.asarray, v)


def _strip_weak_type(tree):
    def f(leaf):
        leaf = jnp.asarray(leaf)
        return leaf.astype(leaf.dtype)

    return jax.tree.map(f, tree)


def train(
    environment: Env,
    num_timesteps: int,
    episode_length: int,
    ckpt_mgr=None,
    config_dict: Optional[dict] = None,
    checkpoint_to_restore: Optional[str] = None,
    action_repeat: int = 1,
    num_envs: int = 1,
    max_devices_per_host: Optional[int] = None,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    kl_weight: float = 1e-3,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 20,
    num_resets_per_eval: int = 0,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    deterministic_eval: bool = False,
    network_factory=ppo_networks.make_intention_ppo_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    normalize_advantage: bool = True,
    eval_env: Optional[Env] = None,
    eval_env_test_set: Optional[Env] = None,
    policy_params_fn: Callable[..., None] = lambda *args, **kwargs: None,
    randomization_fn=None,
    get_activation: bool = True,
    use_lstm: bool = False,
    use_kl_schedule: bool = True,
    kl_ramp_up_frac: float = 0.25,
    freeze_decoder: bool = False,
    checkpoint_callback: Optional[Callable[[int], None]] = None,
    epoch_steps_per_call: Optional[int] = None,
    profile_dir: Optional[str] = None,
    rollout_bf16: bool = False,
):
    """Trains an intention PPO policy; returns (make_policy, params, metrics)."""
    assert batch_size * num_minibatches % num_envs == 0, (
        batch_size * num_minibatches % num_envs
    )
    xt = time.time()
    config_dict = config_dict if config_dict is not None else {
        "network_config": {},
        "env_config": {"render_interval": 1},
    }

    process_count = jax.process_count()
    process_id = jax.process_index()
    devices = jax.devices()
    if max_devices_per_host:
        # bound the per-host device count; the mesh uses the global subset
        local = jax.local_devices()[:max_devices_per_host]
        devices = [d for d in devices if d.process_index != process_id] + local
        devices = sorted(devices, key=lambda d: d.id)
    device_count = len(devices)
    logging.info(
        "Mesh devices: %d, process count: %d (id %d)",
        device_count,
        process_count,
        process_id,
    )
    mesh = mesh_lib.create_mesh(devices)

    env_step_per_training_step = (
        batch_size * unroll_length * num_minibatches * action_repeat
    )
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = np.ceil(
        num_timesteps
        / (
            num_evals_after_init
            * env_step_per_training_step
            * max(num_resets_per_eval, 1)
        )
    ).astype(int)

    # ---- rng layout ------------------------------------------------------
    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key = jax.random.fold_in(local_key, 0)  # single global stream
    local_key, key_env, eval_key = jax.random.split(local_key, 3)
    key_policy, key_value, policy_params_fn_key = jax.random.split(global_key, 3)
    del global_key

    assert num_envs % device_count == 0

    v_randomization_fn = None
    if randomization_fn is not None:
        randomization_rng = jax.random.split(key_env, num_envs)
        v_randomization_fn = functools.partial(
            randomization_fn, rng=randomization_rng
        )

    # foreign (non-tracking) envs go through the adapter stack — the
    # reference's mujoco_playground fallback (mlp_ppo/ppo.py:462-466),
    # rebuilt dependency-free as wrappers.wrap_external
    wrap_for_training = (
        wrappers.wrap
        if isinstance(environment, Env)
        else wrappers.wrap_external
    )
    env = wrap_for_training(
        environment,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=v_randomization_fn,
        use_lstm=use_lstm,
    )

    reset_fn = jax.jit(env.reset)
    key_envs = jax.random.split(key_env, num_envs)
    key_envs = mesh_lib.shard_batch(key_envs, mesh)
    env_state = reset_fn(key_envs)

    if "reference_obs_size" in env_state.info:
        reference_obs_size = int(
            np.asarray(env_state.info["reference_obs_size"])[0]
        )
    else:
        # foreign envs publish no encoder/decoder obs split: the whole
        # observation feeds the encoder (the reference crashes here instead;
        # graceful degradation is this framework's documented difference)
        reference_obs_size = int(np.asarray(env_state.obs).shape[-1])
    if "proprioceptive_obs_size" not in env_state.info:
        proprioceptive_obs_size = 0
    else:
        proprioceptive_obs_size = int(
            np.asarray(env_state.info["proprioceptive_obs_size"])[0]
        )

    config_dict.setdefault("network_config", {}).update(
        {
            "observation_size": env_state.obs.shape[-1],
            "action_size": env.action_size,
            "normalize_observations": normalize_observations,
            "reference_obs_size": reference_obs_size,
            "proprioceptive_obs_size": proprioceptive_obs_size,
        }
    )

    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    ppo_network = network_factory(
        env_state.obs.shape[-1],
        reference_obs_size,
        env.action_size,
        preprocess_observations_fn=normalize,
    )
    make_policy = ppo_networks.make_inference_fn(ppo_network)
    make_logging_policy = ppo_networks.make_logging_inference_fn(ppo_network)
    jit_logging_inference_fn = jax.jit(
        make_logging_policy(deterministic=True, get_activation=get_activation)
    )

    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adam(learning_rate=learning_rate),
    )

    kl_schedule = None
    if use_kl_schedule:
        kl_schedule = losses.create_ramp_schedule(
            max_value=kl_weight,
            ramp_steps=int(num_evals * kl_ramp_up_frac),
            schedule="linear",
        )

    loss_fn = functools.partial(
        losses.compute_ppo_loss,
        ppo_network=ppo_network,
        entropy_cost=entropy_cost,
        kl_weight=kl_weight,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
        kl_schedule=kl_schedule,
    )

    init_params = losses.PPONetworkParams(
        policy=ppo_network.policy_network.init(key_policy),
        value=ppo_network.value_network.init(key_value),
    )
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            jax.ShapeDtypeStruct(env_state.obs.shape[-1:], jnp.dtype("float32"))
        ),
        env_steps=jnp.zeros((), jnp.int32),
    )

    frozen_proprioceptive_normalizer_params = None

    if checkpoint_to_restore is not None:
        from track_mjx_tpu.agent import checkpointing

        if not freeze_decoder:
            training_state = checkpointing.load_training_state(
                checkpoint_to_restore, training_state
            )
            logging.info("Restored latest checkpoint at %s", checkpoint_to_restore)
        else:
            loaded_checkpoint = checkpointing.load_policy(checkpoint_to_restore)
            loaded_normalizer_params = loaded_checkpoint[0]
            loaded_policy = loaded_checkpoint[1]
            decoder_params = loaded_policy["params"]["decoder"]
            new_policy = flax.core.unfreeze(training_state.params.policy)
            new_policy["params"]["decoder"] = decoder_params
            training_state = training_state.replace(
                params=training_state.params.replace(policy=new_policy)
            )
            logging.info(
                "Restored decoder parameters from %s", checkpoint_to_restore
            )
            mask = network_masks.create_decoder_mask(init_params)
            optimizer = optax.chain(optimizer, freeze(mask))
            training_state = training_state.replace(
                optimizer_state=optimizer.init(init_params)
            )
            logging.info("Freezing decoder parameters")
            if proprioceptive_obs_size == 0:
                raise ValueError(
                    "Proprioceptive observation size is 0, "
                    "but decoder parameters are being frozen."
                )
            frozen_proprioceptive_normalizer_params = (
                running_statistics.RunningStatisticsState(
                    count=jnp.zeros(()),
                    mean=loaded_normalizer_params.mean[-proprioceptive_obs_size:],
                    summed_variance=loaded_normalizer_params.summed_variance[
                        -proprioceptive_obs_size:
                    ],
                    std=loaded_normalizer_params.std[-proprioceptive_obs_size:],
                )
            )
            nrm = training_state.normalizer_params
            training_state = training_state.replace(
                normalizer_params=nrm.replace(
                    mean=nrm.mean.at[-proprioceptive_obs_size:].set(
                        frozen_proprioceptive_normalizer_params.mean
                    ),
                    std=nrm.std.at[-proprioceptive_obs_size:].set(
                        frozen_proprioceptive_normalizer_params.std
                    ),
                    summed_variance=nrm.summed_variance.at[
                        -proprioceptive_obs_size:
                    ].set(
                        frozen_proprioceptive_normalizer_params.summed_variance
                    ),
                )
            )

    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=None, has_aux=True
    )

    # ---- epoch program ---------------------------------------------------
    def minibatch_step(carry, data: types.Transition, normalizer_params):
        optimizer_state, params, key, it = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params,
            normalizer_params,
            data,
            key_loss,
            it,
            optimizer_state=optimizer_state,
        )
        return (optimizer_state, params, key, it), metrics

    def sgd_step(carry, unused_t, data: types.Transition, normalizer_params):
        optimizer_state, params, key, it = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert_data(x: jnp.ndarray):
            x = jax.random.permutation(key_perm, x)
            x = jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])
            return x

        shuffled_data = jax.tree.map(convert_data, data)
        (optimizer_state, params, _, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step, normalizer_params=normalizer_params),
            (optimizer_state, params, key_grad, it),
            shuffled_data,
            length=num_minibatches,
        )
        return (optimizer_state, params, key, it), metrics

    def training_step(carry, unused_t):
        training_state, state, key, it = carry
        key_sgd, key_generate_unroll, new_key = jax.random.split(key, 3)

        policy = make_policy(
            (training_state.normalizer_params, training_state.params.policy),
            # bf16 network body on the rollout hot path (MXU-native); the
            # loss-side forward, normalizer, and master params stay f32
            compute_dtype=jnp.bfloat16 if rollout_bf16 else None,
        )

        def f(carry, unused_t):
            current_state, current_key = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data = acting.generate_unroll(
                env,
                current_state,
                policy,
                current_key,
                unroll_length,
                extra_fields=("truncation",),
            )
            return (next_state, next_key), data

        # named scopes label the phases in jax.profiler traces
        # (bench.py --profile-dir / train.py profile_dir)
        with jax.named_scope("rollout"):
            (state, _), data = jax.lax.scan(
                f,
                (state, key_generate_unroll),
                (),
                length=batch_size * num_minibatches // num_envs,
            )
        # leading dims -> (batch_size * num_minibatches, unroll_length)
        data = jax.tree.map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree.map(lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data)
        assert data.discount.shape[1:] == (unroll_length,)

        # global Welford update (no axis name: XLA all-reduces over the mesh)
        with jax.named_scope("normalizer_update"):
            normalizer_params = running_statistics.update(
                training_state.normalizer_params, data.observation
            )
        if (
            proprioceptive_obs_size > 0
            and frozen_proprioceptive_normalizer_params is not None
        ):
            normalizer_params = normalizer_params.replace(
                mean=normalizer_params.mean.at[-proprioceptive_obs_size:].set(
                    frozen_proprioceptive_normalizer_params.mean
                ),
                std=normalizer_params.std.at[-proprioceptive_obs_size:].set(
                    frozen_proprioceptive_normalizer_params.std
                ),
                summed_variance=normalizer_params.summed_variance.at[
                    -proprioceptive_obs_size:
                ].set(frozen_proprioceptive_normalizer_params.summed_variance),
            )

        with jax.named_scope("sgd"):
            (optimizer_state, params, _, _), metrics = jax.lax.scan(
                functools.partial(
                    sgd_step, data=data, normalizer_params=normalizer_params
                ),
                (
                    training_state.optimizer_state,
                    training_state.params,
                    key_sgd,
                    it,
                ),
                (),
                length=num_updates_per_batch,
            )

        new_training_state = TrainingState(
            optimizer_state=optimizer_state,
            params=params,
            normalizer_params=normalizer_params,
            env_steps=jnp.int32(
                training_state.env_steps
                + env_step_per_training_step / STEPS_IN_THOUSANDS
            ),
        )
        return (new_training_state, state, new_key, it), metrics

    # epoch chunking: some runtimes bound the wall time of a single device
    # program (this build's TPU tunnel kills calls beyond ~100 s), so the
    # epoch's training-step scan can be split across several jit calls
    chunk = int(epoch_steps_per_call or num_training_steps_per_epoch)
    chunk = max(1, min(chunk, int(num_training_steps_per_epoch)))
    num_chunks = int(np.ceil(num_training_steps_per_epoch / chunk))

    def training_epoch(
        training_state: TrainingState, state: State, key: types.PRNGKey, it
    ):
        (training_state, state, _, _), loss_metrics = jax.lax.scan(
            training_step,
            (training_state, state, key, it),
            (),
            length=chunk,
        )
        loss_metrics = jax.tree.map(jnp.mean, loss_metrics)
        return training_state, state, loss_metrics

    # donated carries: the round-1 device faults no longer reproduce with the
    # alias-free/fused kernels (tools/donation_repro.py levels 1-3 + trainer
    # soak all clean); donating TrainingState and env State halves the
    # steady-state footprint of the largest live buffers at scale
    training_epoch = jax.jit(training_epoch, donate_argnums=(0, 1))

    training_walltime = 0.0
    epochs_run = 0

    def training_epoch_with_timing(training_state, env_state, key, it):
        nonlocal training_walltime, epochs_run
        t = time.time()
        training_state, env_state = _strip_weak_type((training_state, env_state))
        step = jnp.ones_like(training_state.env_steps) * it
        # scoped jax.profiler capture: exactly one post-compile epoch device
        # call (the whole-run alternative overflows the 2GB XSpace protobuf);
        # phases appear as rollout / normalizer_update / sgd named scopes
        profile_this = profile_dir is not None and epochs_run == 1
        epochs_run += 1
        chunk_metrics = []
        for chunk_i in range(num_chunks):
            key, sub_key = jax.random.split(key)
            if profile_this and chunk_i == 0:
                with jax.profiler.trace(profile_dir):
                    result = training_epoch(training_state, env_state, sub_key, step)
                    jax.block_until_ready(result)
                logging.info("profiler trace written to %s", profile_dir)
            else:
                result = training_epoch(training_state, env_state, sub_key, step)
            training_state, env_state, metrics = _strip_weak_type(result)
            chunk_metrics.append(metrics)
        metrics = jax.tree.map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *chunk_metrics
        )
        jax.tree.map(lambda x: x.block_until_ready(), metrics)

        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (
            chunk
            * num_chunks
            * env_step_per_training_step
            * max(num_resets_per_eval, 1)
        ) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": value for name, value in metrics.items()},
        }
        return training_state, env_state, metrics

    training_state = mesh_lib.replicate(training_state, mesh)

    # ---- evaluators ------------------------------------------------------
    if eval_env is None:
        eval_env = environment
    if randomization_fn is not None:
        v_randomization_fn = functools.partial(
            randomization_fn, rng=jax.random.split(eval_key, num_eval_envs)
        )
    eval_env = (
        wrappers.wrap if isinstance(eval_env, Env) else wrappers.wrap_external
    )(
        eval_env,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=v_randomization_fn,
        use_lstm=use_lstm,
    )
    evaluator = acting.Evaluator(
        eval_env,
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
    )

    evaluator_test_set = None
    if eval_env_test_set is not None:
        key_env, key_env_test_set = jax.random.split(key_env, 2)
        eval_env_test_set = wrappers.wrap(
            eval_env_test_set,
            episode_length=episode_length,
            action_repeat=action_repeat,
            randomization_fn=v_randomization_fn,
            use_lstm=use_lstm,
        )
        evaluator_test_set = acting.Evaluator(
            eval_env_test_set,
            functools.partial(make_policy, deterministic=deterministic_eval),
            num_eval_envs=num_eval_envs,
            episode_length=episode_length,
            action_repeat=action_repeat,
            key=key_env_test_set,
        )

    start_it = 0
    logging.info(
        "Starting at iteration %s with %s evals left", start_it, num_evals_after_init
    )

    # ---- initial eval + checkpoint ---------------------------------------
    metrics = {}
    if process_id == 0 and num_evals > 1:
        policy_param = _to_host(
            (training_state.normalizer_params, training_state.params.policy)
        )
        metrics = evaluator.run_evaluation(policy_param, training_metrics={})
        if evaluator_test_set is not None:
            metrics = evaluator_test_set.run_evaluation(
                policy_param, training_metrics=metrics, data_split="test_set"
            )
        logging.info(metrics)
        progress_fn(start_it, metrics)
        if ckpt_mgr is not None:
            from track_mjx_tpu.agent import checkpointing

            checkpointing.save(
                ckpt_mgr,
                0,
                policy_param,
                _to_host(training_state),
                config_dict,
                checkpoint_callback,
            )
        else:
            logging.info("Skipping checkpoint save as ckpt_mgr is None")

    training_metrics = {}
    start_it += 1
    current_step = 0
    for it in range(start_it, num_evals_after_init + start_it):
        logging.info("starting iteration %s %s", it, time.time() - xt)
        for _ in range(max(num_resets_per_eval, 1)):
            epoch_key, local_key = jax.random.split(local_key)
            (training_state, env_state, training_metrics) = (
                training_epoch_with_timing(training_state, env_state, epoch_key, it)
            )
            current_step = int(np.asarray(training_state.env_steps))

            if num_resets_per_eval > 0:
                key_envs = jax.vmap(lambda x: jax.random.split(x, 1)[0])(key_envs)
                env_state = reset_fn(key_envs)

        if process_id == 0:
            metrics = evaluator.run_evaluation(
                _to_host(
                    (training_state.normalizer_params, training_state.params.policy)
                ),
                training_metrics,
            )
            if evaluator_test_set is not None:
                metrics = evaluator_test_set.run_evaluation(
                    _to_host(
                        (
                            training_state.normalizer_params,
                            training_state.params.policy,
                        )
                    ),
                    metrics,
                    data_split="test_set",
                )
            policy_param = _to_host(
                (training_state.normalizer_params, training_state.params.policy)
            )
            _, policy_params_fn_key = jax.random.split(policy_params_fn_key)
            render_interval = config_dict.get("env_config", {}).get(
                "render_interval", 1
            )
            policy_params_fn(
                current_step=it,
                jit_logging_inference_fn=jit_logging_inference_fn,
                params=policy_param,
                policy_params_fn_key=policy_params_fn_key,
                render_video=(it % render_interval == 0),
            )
            logging.info(metrics)
            progress_fn(current_step, metrics)
            if ckpt_mgr is not None:
                from track_mjx_tpu.agent import checkpointing

                checkpointing.save(
                    ckpt_mgr,
                    it,
                    policy_param,
                    _to_host(training_state),
                    config_dict,
                    checkpoint_callback,
                )

    total_steps = current_step
    mesh_lib.assert_is_replicated(training_state)
    params = _to_host(
        (training_state.normalizer_params, training_state.params.policy)
    )
    logging.info("total steps: %s", total_steps)
    mesh_lib.synchronize_hosts()
    return (make_policy, params, metrics)
