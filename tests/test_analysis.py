"""Analysis-layer tests: offline rollout generation (jit + vmap over clips),
rollout persistence, PCA intention video (no GL required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_toy_env
from track_mjx_tpu.agent import running_statistics
from track_mjx_tpu.agent.mlp_ppo import losses, ppo_networks
from track_mjx_tpu.analysis import rollout as rollout_lib
from track_mjx_tpu.analysis import utils as h5utils


@pytest.fixture(scope="module")
def toy_policy_env():
    env = make_toy_env(clip_length=30)
    obs_size = env.observation_size
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    ref_size = int(state.info["reference_obs_size"])
    net = ppo_networks.make_intention_ppo_networks(
        obs_size,
        ref_size,
        env.action_size,
        preprocess_observations_fn=running_statistics.normalize,
        intention_latent_size=4,
        encoder_hidden_layer_sizes=(16,),
        decoder_hidden_layer_sizes=(16,),
        value_hidden_layer_sizes=(16,),
    )
    params = losses.PPONetworkParams(
        policy=net.policy_network.init(jax.random.PRNGKey(1)),
        value=net.value_network.init(jax.random.PRNGKey(2)),
    )
    norm = running_statistics.init_state(
        jax.ShapeDtypeStruct((obs_size,), jnp.float32)
    )
    make_policy = ppo_networks.make_inference_fn(net)
    policy = make_policy((norm, params.policy), deterministic=True)
    return env, policy


@pytest.fixture(scope="module")
def toy_cfg():
    return {
        "reference_config": {"clip_length": 30},
        "train_setup": {"train_config": {"use_lstm": False}},
        "logging_config": {"rollout_metrics": ["pos_reward", "fall"]},
    }


class TestRolloutGenerator:
    def test_generate_rollout(self, toy_policy_env, toy_cfg):
        env, policy = toy_policy_env
        gen = rollout_lib.create_rollout_generator(
            toy_cfg, env, policy, model="mlp", log_metrics=True
        )
        out = gen(0)
        n_steps = int(30 * env._steps_for_cur_frame)
        assert out["qposes_rollout"].shape == (n_steps, env.plan.nq)
        assert out["qposes_ref"].shape[0] == n_steps
        assert out["ctrl"].shape == (n_steps - 1, env.plan.nu)
        assert out["state_rewards"].shape == (n_steps,)
        assert "rollout_metrics" in out
        assert np.isfinite(np.asarray(out["qposes_rollout"])).all()

    def test_sensor_data_channels(self, toy_policy_env, toy_cfg):
        """log_sensor_data yields per-body cfrc_ext wrenches + sensordata."""
        env, policy = toy_policy_env
        gen = rollout_lib.create_rollout_generator(
            toy_cfg, env, policy, model="mlp", log_sensor_data=True
        )
        out = gen(0)
        n_steps = int(30 * env._steps_for_cur_frame)
        assert out["joint_forces"].shape == (n_steps - 1, env.plan.nbody, 6)
        assert np.isfinite(np.asarray(out["joint_forces"])).all()

    def test_vmap_over_clips(self, toy_policy_env, toy_cfg):
        env, policy = toy_policy_env
        gen = rollout_lib.create_rollout_generator(toy_cfg, env, policy)
        batched = jax.vmap(lambda i: gen(i))(jnp.arange(2))
        assert batched["qposes_rollout"].shape[0] == 2

    def test_rollout_h5_roundtrip(self, toy_policy_env, toy_cfg, tmp_path):
        env, policy = toy_policy_env
        gen = rollout_lib.create_rollout_generator(toy_cfg, env, policy)
        out = gen(1)
        path = str(tmp_path / "rollout.h5")
        h5utils.save_to_h5py(
            path, {k: np.asarray(v) for k, v in out.items()}
        )
        loaded = h5utils.load_from_h5py(path)
        np.testing.assert_allclose(
            loaded["qposes_rollout"], np.asarray(out["qposes_rollout"])
        )


class TestPCAVideo:
    def test_pca_intention_video(self, tmp_path):
        from track_mjx_tpu.analysis.render import plot_pca_intention_video

        intentions = np.random.RandomState(0).randn(20, 8)
        # mp4 degrades to gif when no ffmpeg backend exists; the function
        # returns the actual path written
        out = plot_pca_intention_video(
            intentions, str(tmp_path / "pca.mp4"), fps=5
        )
        import os

        assert os.path.exists(out) and os.path.getsize(out) > 0


class TestCreateEnvironment:
    def test_create_environment_from_cfg(self, tmp_path):
        """create_environment rebuilds a toy-free rodent env from a config
        dict pointing at a synthetic grouped-HDF5 dataset."""
        import mujoco

        from track_mjx_tpu.io import load as load_lib
        from track_mjx_tpu.io.synthetic import synthesize_clips
        from track_mjx_tpu.utils.config import load_config

        cfg = load_config("rodent-full-clips").to_dict()
        # keep it light: build the rodent walker once to synthesize clips
        from track_mjx_tpu.envs.walker.rodent import Rodent

        walker = Rodent(
            joint_names=cfg["walker_config"]["joint_names"],
            body_names=cfg["walker_config"]["body_names"],
            end_eff_names=cfg["walker_config"]["end_eff_names"],
            torque_actuators=cfg["walker_config"]["torque_actuators"],
            rescale_factor=cfg["walker_config"]["rescale_factor"],
        )
        clips = synthesize_clips(walker._mj_model, n_clips=1, n_frames=250)
        data_path = str(tmp_path / "clips.h5")
        load_lib.save_reference_clip_data(clips, data_path)
        cfg["data_path"] = data_path
        env = rollout_lib.create_environment(cfg)
        assert env.plan.nu == 38
        assert env._n_clips == 1


class TestLSTMRolloutGenerator:
    def test_lstm_generate_rollout(self):
        from track_mjx_tpu.agent.lstm_ppo import losses as lstm_losses
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as lstm_nets

        env = make_toy_env(clip_length=20)
        state = jax.jit(env.reset)(jax.random.PRNGKey(0))
        ref_size = int(state.info["reference_obs_size"])
        net = lstm_nets.make_intention_ppo_networks(
            env.observation_size,
            ref_size,
            env.action_size,
            preprocess_observations_fn=running_statistics.normalize,
            intention_latent_size=4,
            hidden_state_size=8,
            hidden_layer_num=2,
            encoder_hidden_layer_sizes=(16,),
            decoder_hidden_layer_sizes=(16,),
            value_hidden_layer_sizes=(16,),
        )
        dummy_hidden = (jnp.zeros((1, 2, 8)), jnp.zeros((1, 2, 8)))
        policy_params = net.policy_network.init(
            jax.random.PRNGKey(1), hidden_state=dummy_hidden
        )
        norm = running_statistics.init_state(
            jax.ShapeDtypeStruct((env.observation_size,), jnp.float32)
        )
        make_policy = lstm_nets.make_inference_fn(net)
        policy = make_policy((norm, policy_params), deterministic=True)
        cfg = {
            "reference_config": {"clip_length": 20},
            "train_setup": {"train_config": {"use_lstm": True}},
            "network_config": {"hidden_state_size": 8, "hidden_layer_num": 2},
            "logging_config": {"rollout_metrics": ["pos_reward"]},
        }
        gen = rollout_lib.create_rollout_generator(cfg, env, policy, model="lstm")
        out = gen(0)
        n_steps = int(20 * env._steps_for_cur_frame)
        assert out["qposes_rollout"].shape == (n_steps, env.plan.nq)
        assert np.isfinite(np.asarray(out["qposes_rollout"])).all()
