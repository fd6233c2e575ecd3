"""Decoder-freeze transfer tests: the mechanism for reusing a trained
low-level controller under a new high-level encoder (reference
mlp_ppo/ppo.py:568-618 + network_masks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_toy_env
from track_mjx_tpu.agent import network_masks
from track_mjx_tpu.agent.mlp_ppo import losses, ppo, ppo_networks


def _tiny_factory(*args, **kwargs):
    kwargs.update(
        intention_latent_size=8,
        encoder_hidden_layer_sizes=(32,),
        decoder_hidden_layer_sizes=(32,),
        value_hidden_layer_sizes=(32,),
    )
    return ppo_networks.make_intention_ppo_networks(*args, **kwargs)


def test_decoder_mask_structure():
    net = _tiny_factory(20, 12, 4)
    params = losses.PPONetworkParams(
        policy=net.policy_network.init(jax.random.PRNGKey(0)),
        value=net.value_network.init(jax.random.PRNGKey(1)),
    )
    mask = network_masks.create_decoder_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    decoder_flags = [
        v for path, v in flat if any("decoder" in str(p) for p in path)
    ]
    other_flags = [
        v for path, v in flat if not any("decoder" in str(p) for p in path)
    ]
    assert decoder_flags and all(decoder_flags)
    assert other_flags and not any(other_flags)


def test_freeze_decoder_training(tmp_path):
    """Full transfer flow: train -> checkpoint -> restore with freeze_decoder
    -> train more -> decoder params identical, encoder params changed,
    proprioceptive normalizer slice pinned."""
    import orbax.checkpoint as ocp

    env = make_toy_env()
    ckpt_dir = str(tmp_path / "src")
    mgr = ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(create=True, step_prefix="PPONetwork"),
    )
    common = dict(
        num_timesteps=128,
        episode_length=16,
        config_dict={
            "network_config": {
                "arch_name": "intention",
                "intention_size": 8,
                "encoder_layer_sizes": [32],
                "decoder_layer_sizes": [32],
                "critic_layer_sizes": [32],
            },
            "env_config": {"render_interval": 10},
            "train_setup": {"train_config": {"use_lstm": False}},
        },
        num_envs=8,
        num_eval_envs=4,
        seed=0,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
        use_lstm=False,
        network_factory=_tiny_factory,
    )
    _, src_params, _ = ppo.train(environment=env, ckpt_mgr=mgr, **common)
    mgr.wait_until_finished()
    src_decoder = src_params[1]["params"]["decoder"]

    _, out_params, _ = ppo.train(
        environment=env,
        ckpt_mgr=None,
        checkpoint_to_restore=ckpt_dir,
        freeze_decoder=True,
        **common,
    )
    out_decoder = out_params[1]["params"]["decoder"]
    # decoder must be exactly the restored (frozen) parameters
    for a, b in zip(jax.tree.leaves(src_decoder), jax.tree.leaves(out_decoder)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder trained from fresh init with active gradients -> differs
    src_enc = jax.tree.leaves(src_params[1]["params"]["encoder"])
    out_enc = jax.tree.leaves(out_params[1]["params"]["encoder"])
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(src_enc, out_enc)
    )
    # proprioceptive normalizer slice pinned to the restored stats
    proprio = int(
        np.asarray(
            jax.jit(env.reset)(jax.random.PRNGKey(0)).info[
                "proprioceptive_obs_size"
            ]
        )
    )
    np.testing.assert_allclose(
        np.asarray(out_params[0].mean[-proprio:]),
        np.asarray(src_params[0].mean[-proprio:]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_params[0].std[-proprio:]),
        np.asarray(src_params[0].std[-proprio:]),
        rtol=1e-6,
    )
