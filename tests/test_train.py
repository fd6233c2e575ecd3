"""End-to-end training smoke tests: tiny PPO runs on the toy env (MLP + LSTM),
checkpoint round-trips, preemption run-state machinery."""

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_toy_env
from track_mjx_tpu.agent import checkpointing, preemption
from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
from track_mjx_tpu.agent.mlp_ppo import ppo_networks as mlp_ppo_networks


def _tiny_network_factory(*args, **kwargs):
    kwargs.update(
        intention_latent_size=8,
        encoder_hidden_layer_sizes=(32,),
        decoder_hidden_layer_sizes=(32,),
        value_hidden_layer_sizes=(32,),
    )
    return mlp_ppo_networks.make_intention_ppo_networks(*args, **kwargs)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Runs a tiny MLP PPO training (2 evals, 1 training step/epoch)."""
    env = make_toy_env()
    model_path = tmp_path_factory.mktemp("ckpts")
    import orbax.checkpoint as ocp

    ckpt_mgr = ocp.CheckpointManager(
        str(model_path),
        options=ocp.CheckpointManagerOptions(create=True, step_prefix="PPONetwork"),
    )
    progress = []
    make_policy, params, metrics = mlp_ppo.train(
        environment=env,
        num_timesteps=256,
        episode_length=16,
        ckpt_mgr=ckpt_mgr,
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
        learning_rate=3e-4,
        entropy_cost=1e-2,
        kl_weight=1e-2,
        discounting=0.97,
        seed=0,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
        reward_scaling=1.0,
        use_lstm=False,
        deterministic_eval=True,
        network_factory=_tiny_network_factory,
        progress_fn=lambda step, m: progress.append((step, m)),
    )
    return env, make_policy, params, metrics, progress, str(model_path)


class TestMLPTraining:
    def test_runs_and_reports_metrics(self, trained):
        _, _, params, metrics, progress, _ = trained
        assert "training/sps" in metrics
        assert metrics["training/sps"] > 0
        assert "eval/episode_reward" in metrics
        assert len(progress) >= 2

    def test_params_finite(self, trained):
        _, _, params, _, _, _ = trained
        leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_policy_inference(self, trained):
        env, make_policy, params, _, _, _ = trained
        policy = make_policy(params, deterministic=True)
        state = jax.jit(env.reset)(jax.random.PRNGKey(0))
        action, extras = policy(state.obs, jax.random.PRNGKey(1))
        assert action.shape == (env.action_size,)
        assert (np.abs(np.asarray(action)) <= 1.0).all()
        assert "latent_mean" in extras

    def test_checkpoint_roundtrip(self, trained):
        env, make_policy, params, _, _, model_path = trained
        cfg = checkpointing.load_config_from_checkpoint(model_path)
        assert cfg["network_config"]["observation_size"] == env.observation_size
        restored = checkpointing.load_policy(model_path, cfg)
        # params = (normalizer, policy); compare a couple of leaves
        orig_leaves = jax.tree.leaves(params[1])
        rest_leaves = jax.tree.leaves(restored[1])
        assert len(orig_leaves) == len(rest_leaves)
        for a, b in zip(orig_leaves, rest_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_load_checkpoint_for_eval_and_inference_fn(self, trained):
        env, _, _, _, _, model_path = trained
        out = checkpointing.load_checkpoint_for_eval(model_path)
        inference_fn = checkpointing.load_inference_fn(
            out["cfg"], out["policy"], deterministic=True, get_activation=False
        )
        state = jax.jit(env.reset)(jax.random.PRNGKey(0))
        action, _ = inference_fn(state.obs, jax.random.PRNGKey(1))
        assert action.shape == (env.action_size,)


class TestLSTMTraining:
    def test_lstm_smoke(self, tmp_path):
        from track_mjx_tpu.agent.lstm_ppo import ppo as lstm_ppo
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as lstm_nets

        env = make_toy_env()

        def factory(*args, **kwargs):
            kwargs.update(
                intention_latent_size=8,
                hidden_state_size=16,
                hidden_layer_num=2,
                encoder_hidden_layer_sizes=(32,),
                decoder_hidden_layer_sizes=(32,),
                value_hidden_layer_sizes=(32,),
            )
            return lstm_nets.make_intention_ppo_networks(*args, **kwargs)

        make_policy, params, metrics = lstm_ppo.train(
            environment=env,
            num_timesteps=128,
            episode_length=16,
            ckpt_mgr=None,
            config_dict={
                "network_config": {"hidden_state_size": 16, "hidden_layer_num": 2},
                "env_config": {"render_interval": 10},
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
            network_factory=factory,
        )
        assert "training/sps" in metrics
        leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


class TestBF16Rollout:
    """rollout_bf16 runs the rollout policy forward in bf16 (intention.py
    compute_dtype); loss/normalizer/master params stay f32. These smoke both
    pipelines end-to-end and pin the output dtype contract."""

    def test_mlp_bf16_trains_finite(self):
        env = make_toy_env()
        _, params, metrics = mlp_ppo.train(
            environment=env,
            num_timesteps=128,
            episode_length=16,
            ckpt_mgr=None,
            config_dict=None,
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
            network_factory=_tiny_network_factory,
            rollout_bf16=True,
        )
        assert "training/sps" in metrics
        leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # master params must remain f32 (only the per-apply cast is bf16)
        assert all(
            l.dtype == jnp.float32
            for l in leaves
            if jnp.issubdtype(l.dtype, jnp.floating)
        )

    def test_lstm_bf16_trains_finite(self):
        from track_mjx_tpu.agent.lstm_ppo import ppo as lstm_ppo
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as lstm_nets

        env = make_toy_env()

        def factory(*args, **kwargs):
            kwargs.update(
                intention_latent_size=8,
                hidden_state_size=16,
                hidden_layer_num=2,
                encoder_hidden_layer_sizes=(32,),
                decoder_hidden_layer_sizes=(32,),
                value_hidden_layer_sizes=(32,),
            )
            return lstm_nets.make_intention_ppo_networks(*args, **kwargs)

        _, params, metrics = lstm_ppo.train(
            environment=env,
            num_timesteps=128,
            episode_length=16,
            ckpt_mgr=None,
            config_dict={
                "network_config": {"hidden_state_size": 16, "hidden_layer_num": 2},
                "env_config": {"render_interval": 10},
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
            network_factory=factory,
            rollout_bf16=True,
        )
        assert "training/sps" in metrics
        leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_bf16_policy_output_is_f32(self, trained):
        env, make_policy, params, *_ = trained
        policy = make_policy(
            (params[0], params[1]), compute_dtype=jnp.bfloat16
        )
        obs = jnp.zeros((3, env.observation_size))
        acts, extras = policy(obs, jax.random.PRNGKey(0))
        assert acts.dtype == jnp.float32
        assert jnp.isfinite(acts).all()
        # and numerically close to the f32 policy (bf16 has ~3 decimal digits)
        policy32 = make_policy((params[0], params[1]))
        acts32, _ = policy32(obs, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(acts), np.asarray(acts32), atol=0.05
        )


class TestPreemption:
    def _cfg(self, tmp_path):
        return {
            "logging_config": {"model_path": str(tmp_path)},
            "train_setup": {"train_config": {"seed": 0}},
        }

    def test_save_discover_cleanup(self, tmp_path):
        cfg = self._cfg(tmp_path)
        ckpt_dir = tmp_path / "run1"
        ckpt_dir.mkdir()
        # no valid orbax checkpoint yet -> discover returns None
        preemption.save_run_state(cfg, "run1", ckpt_dir, "wandb1")
        assert preemption.discover_existing_run_state(cfg) is None

        # with a checkpoint present, discovery succeeds
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(
            str(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                create=True, step_prefix="PPONetwork"
            ),
        )
        mgr.save(
            step=3,
            args=ocp.args.Composite(
                policy=ocp.args.StandardSave({"w": np.zeros(2)})
            ),
        )
        mgr.wait_until_finished()
        found = preemption.discover_existing_run_state(cfg)
        assert found is not None
        assert found["run_id"] == "run1"
        assert found["latest_checkpoint_step"] == 3

        preemption.cleanup_run_state(cfg)
        assert preemption.discover_existing_run_state(cfg) is None

    def test_config_hash_mismatch_ignored(self, tmp_path):
        cfg = self._cfg(tmp_path)
        ckpt_dir = tmp_path / "run2"
        ckpt_dir.mkdir()
        preemption.save_run_state(cfg, "run2", ckpt_dir, "wandb2")
        cfg2 = self._cfg(tmp_path)
        cfg2["train_setup"]["train_config"]["seed"] = 1
        assert preemption.discover_existing_run_state(cfg2) is None

    def test_checkpoint_callback_updates_state(self, tmp_path):
        cfg = self._cfg(tmp_path)
        ckpt_dir = tmp_path / "run3"
        ckpt_dir.mkdir()
        cb = preemption.create_checkpoint_callback(cfg, "run3", ckpt_dir, "wandb3")
        cb(7)
        store = preemption.RunStateStore(cfg)
        state = store._read_locked()
        assert state["latest_checkpoint_step"] == 7
