"""Composite Orbax checkpointing for PPO runs.

Equivalent capability to track_mjx/agent/checkpointing.py (composite
{policy, train_state, config} checkpoints with step_prefix "PPONetwork" and
a config-authoritative resume contract), redesigned around a
``CheckpointStore`` that owns the manager lifecycle and a single restore
core; the abstract-pytree builders (what shapes to restore into) live
separately. Functional wrappers keep the trainer/analysis call sites simple.

Layout per step: policy = (normalizer_state, policy_params),
train_state = full TrainingState pytree, config = the run's JSON config.
The stored config is authoritative on resume (train.py:117-133 decides from
it, not from the caller's config).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from orbax import checkpoint as ocp

from track_mjx_tpu.agent import running_statistics

STEP_PREFIX = "PPONetwork"

# legacy configs predate these train_config keys; loaders backfill them so
# old checkpoints restore under the current trainer
_LEGACY_TRAIN_DEFAULTS = {
    "use_lstm": False,
    "get_activation": False,
    "deterministic_eval": False,
}


class CheckpointStore:
    """Read access to one checkpoint directory (manager owned here)."""

    def __init__(self, checkpoint_path: str, step_prefix: str = STEP_PREFIX):
        self.path = checkpoint_path
        self._mgr = ocp.CheckpointManager(
            checkpoint_path,
            options=ocp.CheckpointManagerOptions(
                create=False, step_prefix=step_prefix
            ),
        )

    def resolve_step(self, step: Optional[int]) -> int:
        return self._mgr.latest_step() if step is None else step

    def _restore(self, step: Optional[int], **items) -> dict:
        step = self.resolve_step(step)
        return self._mgr.restore(step, args=ocp.args.Composite(**items))

    def config(self, step: Optional[int] = None) -> dict:
        """The stored JSON config, with legacy keys backfilled."""
        logging.info("Loading config from %s at step %s", self.path, step)
        cfg = self._restore(step, config=ocp.args.JsonRestore())["config"]
        train_config = cfg.setdefault("train_setup", {}).setdefault(
            "train_config", {}
        )
        for key, default in _LEGACY_TRAIN_DEFAULTS.items():
            train_config.setdefault(key, default)
        return cfg

    def training_state(self, abstract_training_state, step: Optional[int] = None):
        """The full TrainingState, restored into the given abstract pytree."""
        logging.info("Loading training state from %s at step %s", self.path, step)
        return self._restore(
            step, train_state=ocp.args.StandardRestore(abstract_training_state)
        )["train_state"]

    def policy(self, cfg: Optional[dict] = None, step: Optional[int] = None):
        """(normalizer_params, policy_params), shaped from the stored config."""
        if cfg is None:
            cfg = self.config(step)
        abstract = make_abstract_policy(cfg)
        return self._restore(step, policy=ocp.args.StandardRestore(abstract))[
            "policy"
        ]

    def for_eval(self, step: Optional[int] = None) -> dict:
        """{cfg, policy} bundle for offline analysis."""
        logging.info("Loading checkpoint from %s at step %s", self.path, step)
        cfg = self.config(step)
        return {"cfg": cfg, "policy": self.policy(cfg, step)}

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save(
    ckpt_mgr, step, policy, training_state, config, checkpoint_callback=None
) -> None:
    """Saves the composite checkpoint and fires the run-state callback."""
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


# ---- abstract pytree / network builders ------------------------------------


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


def _networks_module(cfg: dict):
    if bool(cfg["train_setup"]["train_config"].get("use_lstm", False)):
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as nets
    else:
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks as nets
    return nets


def make_ppo_network_from_cfg(cfg: dict):
    """Reconstructs the PPO network bundle from a checkpoint config."""
    nets = _networks_module(cfg)
    net_cfg = cfg["network_config"]

    normalize = lambda x, y: x
    if net_cfg["normalize_observations"]:
        normalize = running_statistics.normalize

    if net_cfg["arch_name"] != "intention":
        raise ValueError(f"Unknown network architecture: {net_cfg['arch_name']}")

    kwargs = dict(
        observation_size=net_cfg["observation_size"],
        reference_obs_size=net_cfg["reference_obs_size"],
        action_size=net_cfg["action_size"],
        intention_latent_size=net_cfg["intention_size"],
        preprocess_observations_fn=normalize,
        encoder_hidden_layer_sizes=tuple(net_cfg["encoder_layer_sizes"]),
        decoder_hidden_layer_sizes=tuple(net_cfg["decoder_layer_sizes"]),
        value_hidden_layer_sizes=tuple(net_cfg["critic_layer_sizes"]),
    )
    if bool(cfg["train_setup"]["train_config"].get("use_lstm", False)):
        kwargs.update(
            hidden_state_size=net_cfg["hidden_state_size"],
            hidden_layer_num=net_cfg["hidden_layer_num"],
        )
    return nets.make_intention_ppo_networks(**kwargs)


def load_inference_fn(
    cfg: dict, policy_params, deterministic: bool = True, get_activation: bool = True
) -> Callable:
    """Builds a policy inference function from config + restored params."""
    nets = _networks_module(cfg)
    ppo_network = make_ppo_network_from_cfg(cfg)
    make_policy = nets.make_inference_fn(ppo_network)
    return make_policy(
        policy_params, deterministic=deterministic, get_activation=get_activation
    )


# ---- functional API (trainer / analysis call sites) ------------------------


def load_config_from_checkpoint(
    checkpoint_path: str, step_prefix: str = STEP_PREFIX, step: Optional[int] = None
) -> dict:
    with CheckpointStore(checkpoint_path, step_prefix) as store:
        return store.config(step)


def load_training_state(
    checkpoint_path: str,
    abstract_training_state,
    step_prefix: str = STEP_PREFIX,
    step: Optional[int] = None,
):
    with CheckpointStore(checkpoint_path, step_prefix) as store:
        return store.training_state(abstract_training_state, step)


def load_policy(
    checkpoint_path: str,
    cfg: Optional[dict] = None,
    ckpt_mgr: Any = None,  # accepted for backward compat; unused
    step_prefix: str = STEP_PREFIX,
    step: Optional[int] = None,
):
    del ckpt_mgr
    with CheckpointStore(checkpoint_path, step_prefix) as store:
        return store.policy(cfg, step)


def load_checkpoint_for_eval(
    checkpoint_path: str, step_prefix: str = STEP_PREFIX, step: Optional[int] = None
) -> dict:
    with CheckpointStore(checkpoint_path, step_prefix) as store:
        return store.for_eval(step)
