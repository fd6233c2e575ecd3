"""PPO trainer for the LSTM intention pipeline — pjit/global-array SPMD.

Behavioral parity with track_mjx/agent/lstm_ppo/ppo.py (same pjit
re-architecture as the MLP trainer; see mlp_ppo/ppo.py for the distribution
design). LSTM-specific differences preserved from the reference:
- TrainingState additionally carries the per-env rollout hidden_state
  (:64-72), threaded through training steps (:456-464);
- rollouts use the LSTM acting functions (hidden threading, done-resets)
  (:395-421);
- the normalizer is updated AFTER the SGD pass from pre-update statistics
  (:436, :450-454);
- plain adam optimizer (:311), no KL schedule (step placeholder, :336),
  no freeze_decoder / test-split evaluators.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from track_mjx_tpu.agent import gradients, running_statistics, types
from track_mjx_tpu.agent.lstm_ppo import acting
from track_mjx_tpu.agent.lstm_ppo import losses as ppo_losses
from track_mjx_tpu.agent.lstm_ppo import ppo_networks
from track_mjx_tpu.envs import wrappers
from track_mjx_tpu.envs.base import Env, State
from track_mjx_tpu.parallel import mesh as mesh_lib

Metrics = types.Metrics
STEPS_IN_THOUSANDS = 1e3


@flax.struct.dataclass
class TrainingState:
    """Learner state; hidden_state is the per-env rollout LSTM carry."""

    optimizer_state: optax.OptState
    params: ppo_losses.PPONetworkParams
    hidden_state: Tuple[jnp.ndarray, jnp.ndarray]
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jnp.ndarray


def _to_host(v):
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
    get_activation: bool = False,
    use_lstm: bool = True,
    use_kl_schedule: bool = False,
    kl_ramp_up_frac: float = 0.25,
    freeze_decoder: bool = False,
    checkpoint_callback: Optional[Callable[[int], None]] = None,
    epoch_steps_per_call: Optional[int] = None,
    profile_dir: Optional[str] = None,
    rollout_bf16: bool = False,
):
    """Trains an LSTM intention PPO policy."""
    del use_kl_schedule, kl_ramp_up_frac, freeze_decoder, eval_env_test_set
    assert batch_size * num_minibatches % num_envs == 0
    xt = time.time()
    config_dict = config_dict if config_dict is not None else {
        "network_config": {"hidden_state_size": 128, "hidden_layer_num": 2},
        "env_config": {"render_interval": 1},
    }
    hidden_state_size = config_dict["network_config"]["hidden_state_size"]
    hidden_layer_num = config_dict["network_config"]["hidden_layer_num"]

    process_id = jax.process_index()
    mesh = mesh_lib.create_mesh()
    device_count = len(jax.devices())

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

    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key, key_env, eval_key = jax.random.split(local_key, 3)
    key_policy, key_value, policy_params_fn_key = jax.random.split(global_key, 3)
    del global_key

    assert num_envs % device_count == 0

    env = wrappers.wrap(
        environment,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=randomization_fn,
        use_lstm=True,
        hidden_state_dim=hidden_state_size,
        hidden_layer_num=hidden_layer_num,
    )

    reset_fn = jax.jit(env.reset)
    key_envs = jax.random.split(key_env, num_envs)
    key_envs = mesh_lib.shard_batch(key_envs, mesh)
    env_state = reset_fn(key_envs)

    reference_obs_size = int(np.asarray(env_state.info["reference_obs_size"])[0])
    proprioceptive_obs_size = (
        int(np.asarray(env_state.info["proprioceptive_obs_size"])[0])
        if "proprioceptive_obs_size" in env_state.info
        else 0
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
        make_logging_policy(deterministic=True, get_activation=False)
    )

    optimizer = optax.adam(learning_rate=learning_rate)

    loss_fn = functools.partial(
        ppo_losses.compute_ppo_loss,
        ppo_network=ppo_network,
        entropy_cost=entropy_cost,
        kl_weight=kl_weight,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
    )
    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=None, has_aux=True
    )

    def minibatch_step(carry, data: types.Transition, normalizer_params):
        optimizer_state, params, key = carry
        step = 0  # placeholder: no KL schedule in the LSTM loss
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params,
            normalizer_params,
            data,
            key_loss,
            step,
            optimizer_state=optimizer_state,
        )
        return (optimizer_state, params, key), metrics

    def sgd_step(carry, unused_t, data: types.Transition, normalizer_params):
        optimizer_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert_data(x: jnp.ndarray):
            x = jax.random.permutation(key_perm, x)
            x = jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])
            return x

        shuffled_data = jax.tree.map(convert_data, data)
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step, normalizer_params=normalizer_params),
            (optimizer_state, params, key_grad),
            shuffled_data,
            length=num_minibatches,
        )
        return (optimizer_state, params, key), metrics

    def training_step(carry, unused_t):
        training_state, state, key = carry
        key_sgd, key_generate_unroll, new_key = jax.random.split(key, 3)

        policy = make_policy(
            params=(training_state.normalizer_params, training_state.params.policy),
            get_activation=get_activation,
            # bf16 network body on the rollout hot path (MXU-native); the
            # BPTT loss forward, normalizer, master params, and the carried
            # LSTM hidden state stay f32
            compute_dtype=jnp.bfloat16 if rollout_bf16 else None,
        )

        def f(carry, unused_t):
            current_state, current_key, hidden_state = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data, forward_hidden_state = acting.generate_unroll(
                env,
                current_state,
                policy,
                current_key,
                hidden_state,
                unroll_length,
                extra_fields=("truncation",),
            )
            return (next_state, next_key, forward_hidden_state), data

        # named scopes label the phases in jax.profiler traces
        with jax.named_scope("rollout"):
            (state, _, forward_hidden_state), data = jax.lax.scan(
                f,
                (state, key_generate_unroll, training_state.hidden_state),
                (),
                length=batch_size * num_minibatches // num_envs,
            )
        data = jax.tree.map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree.map(lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data)
        assert data.discount.shape[1:] == (unroll_length,)

        # SGD uses the PRE-update normalizer; the normalizer itself is updated
        # afterwards from this batch (reference :436, :450-454)
        normalizer_params = training_state.normalizer_params
        with jax.named_scope("sgd"):
            (optimizer_state, params, _), metrics = jax.lax.scan(
                functools.partial(
                    sgd_step, data=data, normalizer_params=normalizer_params
                ),
                (training_state.optimizer_state, training_state.params, key_sgd),
                (),
                length=num_updates_per_batch,
            )

        with jax.named_scope("normalizer_update"):
            normalizer_params = running_statistics.update(
                training_state.normalizer_params, data.observation
            )

        new_training_state = TrainingState(
            optimizer_state=optimizer_state,
            params=params,
            hidden_state=forward_hidden_state,
            normalizer_params=normalizer_params,
            env_steps=jnp.int32(
                training_state.env_steps
                + env_step_per_training_step / STEPS_IN_THOUSANDS
            ),
        )
        return (new_training_state, state, new_key), metrics

    # epoch chunking (see mlp_ppo/ppo.py): bound single-device-call runtime
    chunk = int(epoch_steps_per_call or num_training_steps_per_epoch)
    chunk = max(1, min(chunk, int(num_training_steps_per_epoch)))
    num_chunks = int(np.ceil(num_training_steps_per_epoch / chunk))

    def training_epoch(training_state: TrainingState, state: State, key):
        (training_state, state, _), loss_metrics = jax.lax.scan(
            training_step,
            (training_state, state, key),
            (),
            length=chunk,
        )
        loss_metrics = jax.tree.map(jnp.mean, loss_metrics)
        return training_state, state, loss_metrics

    # donated carries (see mlp_ppo/ppo.py: round-1 faults no longer reproduce)
    training_epoch = jax.jit(training_epoch, donate_argnums=(0, 1))

    training_walltime = 0.0
    epochs_run = 0

    def training_epoch_with_timing(training_state, env_state, key):
        nonlocal training_walltime, epochs_run
        t = time.time()
        training_state, env_state = _strip_weak_type((training_state, env_state))
        # scoped jax.profiler capture of one post-compile epoch device call
        # (see mlp_ppo/ppo.py: whole-run traces overflow the XSpace protobuf)
        profile_this = profile_dir is not None and epochs_run == 1
        epochs_run += 1
        chunk_metrics = []
        for chunk_i in range(num_chunks):
            key, sub_key = jax.random.split(key)
            if profile_this and chunk_i == 0:
                with jax.profiler.trace(profile_dir):
                    result = training_epoch(training_state, env_state, sub_key)
                    jax.block_until_ready(result)
                logging.info("profiler trace written to %s", profile_dir)
            else:
                result = training_epoch(training_state, env_state, sub_key)
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

    # per-env rollout hidden (wrapper initialized it on reset)
    dummy_hidden_state = env_state.info["hidden_state"]

    init_params = ppo_losses.PPONetworkParams(
        policy=ppo_network.policy_network.init(
            key=key_policy,
            hidden_state=jax.tree.map(np.asarray, dummy_hidden_state),
        ),
        value=ppo_network.value_network.init(key_value),
    )
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        # own copy: training_state and env_state are both donated to the
        # epoch jit, so they must not share device buffers (the wrapper's
        # reset hidden lives in env_state.info["hidden_state"] too)
        hidden_state=jax.tree.map(lambda x: jnp.array(x), dummy_hidden_state),
        normalizer_params=running_statistics.init_state(
            jax.ShapeDtypeStruct(env_state.obs.shape[-1:], jnp.dtype("float32"))
        ),
        env_steps=jnp.zeros((), jnp.int32),
    )

    if checkpoint_to_restore is not None:
        import orbax.checkpoint as ocp

        options = ocp.CheckpointManagerOptions(create=False, step_prefix="PPONetwork")
        prev_ckpt_mgr = ocp.CheckpointManager(checkpoint_to_restore, options=options)
        latest_step = prev_ckpt_mgr.latest_step()
        training_state = prev_ckpt_mgr.restore(
            latest_step,
            args=ocp.args.Composite(
                train_state=ocp.args.StandardRestore(_to_host(training_state))
            ),
        )["train_state"]
        logging.info(
            "Restored checkpoint at step %s at %s", latest_step, checkpoint_to_restore
        )

    training_state = mesh_lib.replicate(training_state, mesh)
    # hidden_state is per-env: shard it along the batch axis
    training_state = training_state.replace(
        hidden_state=mesh_lib.shard_batch(training_state.hidden_state, mesh)
    )

    if not eval_env:
        eval_env = environment
    eval_env = wrappers.wrap(
        eval_env,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=randomization_fn,
        use_lstm=True,
        hidden_state_dim=hidden_state_size,
        hidden_layer_num=hidden_layer_num,
    )
    evaluator = acting.Evaluator(
        eval_env,
        functools.partial(
            make_policy, deterministic=deterministic_eval, get_activation=get_activation
        ),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
    )

    # initial eval + checkpoint
    metrics = {}
    if process_id == 0 and num_evals > 1:
        policy_param = _to_host(
            (training_state.normalizer_params, training_state.params.policy)
        )
        metrics = evaluator.run_evaluation(policy_param, training_metrics={})
        logging.info(metrics)
        progress_fn(0, metrics)
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

    training_metrics = {}
    current_step = 0
    for it in range(1, num_evals_after_init + 1):
        logging.info("starting iteration %s %s", it, time.time() - xt)
        for _ in range(max(num_resets_per_eval, 1)):
            epoch_key, local_key = jax.random.split(local_key)
            (training_state, env_state, training_metrics) = (
                training_epoch_with_timing(training_state, env_state, epoch_key)
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
            logging.info(metrics)
            progress_fn(current_step, metrics)
            policy_param = _to_host(
                (training_state.normalizer_params, training_state.params.policy)
            )
            _, policy_params_fn_key = jax.random.split(policy_params_fn_key)
            policy_params_fn(
                current_step=it,
                jit_logging_inference_fn=jit_logging_inference_fn,
                params=policy_param,
                policy_params_fn_key=policy_params_fn_key,
            )
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
    mesh_lib.assert_is_replicated(
        training_state.replace(hidden_state=(jnp.zeros(()), jnp.zeros(())))
    )
    params = _to_host(
        (training_state.normalizer_params, training_state.params.policy)
    )
    logging.info("total steps: %s", total_steps)
    mesh_lib.synchronize_hosts()
    return (make_policy, params, metrics)
