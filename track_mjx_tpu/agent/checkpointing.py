"""Orbax composite checkpointing (behavioral parity: track_mjx/agent/
checkpointing.py).

Checkpoints are Orbax composites {policy, train_state, config-JSON} with
step_prefix "PPONetwork" (reference :280-299); loaders reconstruct abstract
pytrees from the stored config (:73-96, :165-198). The stored config is
authoritative on resume."""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from orbax import checkpoint as ocp

from track_mjx_tpu.agent import running_statistics

STEP_PREFIX = "PPONetwork"


def load_config_from_checkpoint(
    checkpoint_path: str, step_prefix: str = STEP_PREFIX, step: Optional[int] = None
) -> dict:
    """Loads the JSON config stored alongside a checkpoint; backfills legacy
    keys (reference :38-44)."""
    mgr_options = ocp.CheckpointManagerOptions(create=False, step_prefix=step_prefix)
    with ocp.CheckpointManager(checkpoint_path, options=mgr_options) as ckpt_mgr:
        if step is None:
            step = ckpt_mgr.latest_step()
        logging.info("Loading config from %s at step %s", checkpoint_path, step)
        cfg = ckpt_mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )["config"]
        train_config = cfg.setdefault("train_setup", {}).setdefault(
            "train_config", {}
        )
        train_config.setdefault("use_lstm", False)
        train_config.setdefault("get_activation", False)
        train_config.setdefault("deterministic_eval", False)
        return cfg


def load_training_state(
    checkpoint_path: str,
    abstract_training_state,
    step_prefix: str = STEP_PREFIX,
    step: Optional[int] = None,
):
    """Restores a full TrainingState shaped like the given abstract pytree."""
    mgr_options = ocp.CheckpointManagerOptions(create=False, step_prefix=step_prefix)
    with ocp.CheckpointManager(checkpoint_path, options=mgr_options) as ckpt_mgr:
        if step is None:
            step = ckpt_mgr.latest_step()
        logging.info(
            "Loading training state from %s at step %s", checkpoint_path, step
        )
        return ckpt_mgr.restore(
            step,
            args=ocp.args.Composite(
                train_state=ocp.args.StandardRestore(abstract_training_state)
            ),
        )["train_state"]


def load_policy(
    checkpoint_path: str,
    cfg: Optional[dict] = None,
    ckpt_mgr=None,
    step_prefix: str = STEP_PREFIX,
    step: Optional[int] = None,
):
    """Restores (normalizer_params, policy_params) via an abstract policy
    reconstructed from the stored config."""
    if cfg is None:
        cfg = load_config_from_checkpoint(checkpoint_path, step_prefix, step)
    abstract_policy = make_abstract_policy(cfg)
    if ckpt_mgr is None:
        mgr_options = ocp.CheckpointManagerOptions(
            create=False, step_prefix=step_prefix
        )
        ckpt_mgr = ocp.CheckpointManager(checkpoint_path, options=mgr_options)
    if step is None:
        step = ckpt_mgr.latest_step()
    return ckpt_mgr.restore(
        step,
        args=ocp.args.Composite(policy=ocp.args.StandardRestore(abstract_policy)),
    )["policy"]


def load_checkpoint_for_eval(
    checkpoint_path: str, step_prefix: str = STEP_PREFIX, step: Optional[int] = None
) -> dict:
    """Loads {cfg, policy} for offline analysis (reference :99-135)."""
    mgr_options = ocp.CheckpointManagerOptions(create=False, step_prefix=step_prefix)
    ckpt_mgr = ocp.CheckpointManager(checkpoint_path, options=mgr_options)
    if step is None:
        step = ckpt_mgr.latest_step()
    logging.info("Loading checkpoint from %s at step %s", checkpoint_path, step)
    cfg = load_config_from_checkpoint(checkpoint_path, step_prefix, step)
    policy = load_policy(checkpoint_path, cfg, ckpt_mgr, step_prefix, step)
    return {"cfg": cfg, "policy": policy}


def make_dummy_lstm_hidden(cfg: dict):
    """Dummy per-env (h, c) stacks for abstract LSTM policy construction."""
    num_layers = cfg["network_config"]["hidden_layer_num"]
    hidden_dim = cfg["network_config"]["hidden_state_size"]
    batch_size = cfg["train_setup"]["train_config"]["batch_size"]
    shape = (batch_size, num_layers, hidden_dim)
    return (jnp.zeros(shape), jnp.zeros(shape))


def make_abstract_policy(cfg: dict, seed: int = 1):
    """Builds (normalizer_state, policy_params) with the right structure."""
    from track_mjx_tpu.agent.mlp_ppo import losses as mlp_losses

    use_lstm = bool(cfg["train_setup"]["train_config"].get("use_lstm", False))
    ppo_network = make_ppo_network_from_cfg(cfg)
    key_policy, key_value = jax.random.split(jax.random.PRNGKey(seed))

    if use_lstm:
        from track_mjx_tpu.agent.lstm_ppo import losses as lstm_losses

        dummy_hidden_state = make_dummy_lstm_hidden(cfg)
        init_params = lstm_losses.PPONetworkParams(
            policy=ppo_network.policy_network.init(
                key_policy, hidden_state=dummy_hidden_state
            ),
            value=ppo_network.value_network.init(key_value),
        )
    else:
        init_params = mlp_losses.PPONetworkParams(
            policy=ppo_network.policy_network.init(key_policy),
            value=ppo_network.value_network.init(key_value),
        )

    return (
        running_statistics.init_state(
            jax.ShapeDtypeStruct(
                (cfg["network_config"]["observation_size"],), jnp.dtype("float32")
            )
        ),
        init_params.policy,
    )


def load_inference_fn(
    cfg: dict, policy_params, deterministic: bool = True, get_activation: bool = True
) -> Callable:
    """Builds a policy inference function from config + restored params."""
    use_lstm = bool(cfg["train_setup"]["train_config"].get("use_lstm", False))
    if use_lstm:
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as nets
    else:
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks as nets
    ppo_network = make_ppo_network_from_cfg(cfg)
    make_policy = nets.make_inference_fn(ppo_network)
    return make_policy(
        policy_params, deterministic=deterministic, get_activation=get_activation
    )


def make_ppo_network_from_cfg(cfg: dict):
    """Reconstructs the PPO network bundle from a checkpoint config."""
    use_lstm = bool(cfg["train_setup"]["train_config"].get("use_lstm", False))
    if use_lstm:
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as nets
    else:
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks as nets

    normalize = lambda x, y: x
    if cfg["network_config"]["normalize_observations"]:
        normalize = running_statistics.normalize

    if cfg["network_config"]["arch_name"] != "intention":
        raise ValueError(
            f"Unknown network architecture: {cfg['network_config']['arch_name']}"
        )

    kwargs = dict(
        observation_size=cfg["network_config"]["observation_size"],
        reference_obs_size=cfg["network_config"]["reference_obs_size"],
        action_size=cfg["network_config"]["action_size"],
        intention_latent_size=cfg["network_config"]["intention_size"],
        preprocess_observations_fn=normalize,
        encoder_hidden_layer_sizes=tuple(
            cfg["network_config"]["encoder_layer_sizes"]
        ),
        decoder_hidden_layer_sizes=tuple(
            cfg["network_config"]["decoder_layer_sizes"]
        ),
        value_hidden_layer_sizes=tuple(cfg["network_config"]["critic_layer_sizes"]),
    )
    if use_lstm:
        kwargs.update(
            hidden_state_size=cfg["network_config"]["hidden_state_size"],
            hidden_layer_num=cfg["network_config"]["hidden_layer_num"],
        )
    return nets.make_intention_ppo_networks(**kwargs)


def save(
    ckpt_mgr, step, policy, training_state, config, checkpoint_callback=None
) -> None:
    """Saves the composite {policy, train_state, config} checkpoint and fires
    the preemption run-state callback (reference :280-307)."""
    ckpt_mgr.save(
        step=step,
        args=ocp.args.Composite(
            policy=ocp.args.StandardSave(policy),
            train_state=ocp.args.StandardSave(training_state),
            config=ocp.args.JsonSave(config),
        ),
    )
    if checkpoint_callback is not None:
        try:
            checkpoint_callback(step)
        except Exception as e:  # noqa: BLE001 - callback must not kill training
            logging.warning("Checkpoint callback failed: %s", e)
