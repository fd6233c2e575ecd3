"""IO-layer tests: clip loaders (both HDF5 layouts), splits, pytree-H5
round-trips, config system."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from track_mjx_tpu.analysis import utils as h5utils
from track_mjx_tpu.io import load
from track_mjx_tpu.utils.config import ConfigDict, apply_overrides, load_config


def _fake_clip(n_clips=3, frames=10, njoint=5, nbody=4):
    rng = np.random.RandomState(0)
    return load.ReferenceClip(
        position=jnp.array(rng.randn(n_clips, frames, 3), jnp.float32),
        quaternion=jnp.array(rng.randn(n_clips, frames, 4), jnp.float32),
        joints=jnp.array(rng.randn(n_clips, frames, njoint), jnp.float32),
        body_positions=jnp.array(rng.randn(n_clips, frames, nbody, 3), jnp.float32),
        velocity=jnp.array(rng.randn(n_clips, frames, 3), jnp.float32),
        angular_velocity=jnp.array(rng.randn(n_clips, frames, 3), jnp.float32),
        joints_velocity=jnp.array(rng.randn(n_clips, frames, njoint), jnp.float32),
        body_quaternions=jnp.array(rng.randn(n_clips, frames, nbody, 4), jnp.float32),
    )


class TestGroupedFormat:
    def test_save_load_roundtrip(self, tmp_path):
        clip = _fake_clip()
        path = tmp_path / "clips.h5"
        load.save_reference_clip_data(clip, path)
        loaded = load.load_reference_clip_data(path)
        np.testing.assert_allclose(
            np.asarray(loaded.position), np.asarray(clip.position)
        )
        np.testing.assert_allclose(
            np.asarray(loaded.body_quaternions), np.asarray(clip.body_quaternions)
        )

    def test_load_data_fallback(self, tmp_path):
        """load_data falls back from stac format to grouped format."""
        clip = _fake_clip()
        path = tmp_path / "clips.h5"
        load.save_reference_clip_data(clip, path)
        loaded = load.load_data(path)
        assert loaded.position.shape == clip.position.shape

    def test_missing_group_raises(self, tmp_path):
        path = tmp_path / "empty.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("unrelated", data=[1, 2, 3])
        with pytest.raises(KeyError):
            load.load_reference_clip_data(path)


class TestStacFormat:
    def test_make_multiclip_data(self, tmp_path):
        """Flat stac layout: (clips*frames, dim) + embedded yaml config."""
        n_clips, frames, nq, nbody = 2, 5, 12, 4
        rng = np.random.RandomState(1)
        qpos = rng.randn(n_clips * frames, nq)
        qvel = rng.randn(n_clips * frames, nq - 1)
        xpos = rng.randn(n_clips * frames, nbody, 3)
        xquat = rng.randn(n_clips * frames, nbody, 4)
        path = tmp_path / "stac.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("qpos", data=qpos)
            f.create_dataset("qvel", data=qvel)
            f.create_dataset("xpos", data=xpos)
            f.create_dataset("xquat", data=xquat)
            f.create_dataset(
                "config",
                data=f"stac:\n  n_frames_per_clip: {frames}\n".encode(),
            )
        clip = load.make_multiclip_data(path)
        assert clip.position.shape == (n_clips, frames, 3)
        assert clip.joints.shape == (n_clips, frames, nq - 7)
        assert clip.body_positions.shape == (n_clips, frames, nbody, 3)
        # load_data should pick this format directly
        clip2 = load.load_data(path)
        np.testing.assert_allclose(
            np.asarray(clip2.quaternion), np.asarray(clip.quaternion)
        )


class TestSplits:
    def test_train_test_split(self):
        clip = _fake_clip(n_clips=10)
        train, test = load.generate_train_test_split(clip, test_ratio=0.3, seed=0)
        assert test.position.shape[0] == 3
        assert train.position.shape[0] == 7
        # original indices recorded and disjoint
        tr = set(np.asarray(train.original_clip_idx).ravel().tolist())
        te = set(np.asarray(test.original_clip_idx).ravel().tolist())
        assert tr.isdisjoint(te)
        assert tr | te == set(range(10))

    def test_select_clips(self):
        clip = _fake_clip(n_clips=5)
        sel = load.select_clips(clip, np.array([0, 3]))
        assert sel.position.shape[0] == 2
        np.testing.assert_array_equal(
            np.asarray(sel.original_clip_idx).ravel(), [0, 3]
        )

    def test_sub_sample(self):
        idx = np.arange(100)
        sub = load.sub_sample_training_set(idx, train_ratio=0.25, seed=0)
        assert len(sub) == 25
        assert np.all(np.diff(sub) > 0)


class TestH5Pytree:
    def test_roundtrip_nested(self, tmp_path):
        data = {
            "qposes": np.random.randn(4, 3),
            "meta": {"reward": 1.5, "name": "clip0", "flag": True},
            "list_of_arrays": [np.arange(3), np.arange(4)],
        }
        path = str(tmp_path / "rollout.h5")
        h5utils.save_to_h5py(path, data)
        loaded = h5utils.load_from_h5py(path)
        np.testing.assert_allclose(loaded["qposes"], data["qposes"])
        assert loaded["meta"]["reward"] == 1.5
        assert loaded["meta"]["name"] == "clip0"
        np.testing.assert_array_equal(loaded["list_of_arrays"][1], np.arange(4))


class TestConfigSystem:
    def test_load_named_config(self):
        cfg = load_config("rodent-full-clips")
        assert cfg.env_config.env_name == "rodent_multi_clip"
        assert cfg.train_setup.train_config.num_envs == 4096
        assert cfg.walker_config.torque_actuators is True

    def test_dotted_overrides(self):
        cfg = load_config(
            "rodent-full-clips",
            overrides=[
                "train_setup.train_config.num_envs=128",
                "data_path=/tmp/x.h5",
                "env_config.env_args.iterations=3",
            ],
        )
        assert cfg.train_setup.train_config.num_envs == 128
        assert cfg.data_path == "/tmp/x.h5"
        assert cfg.env_config.env_args.iterations == 3

    def test_to_dict_json_serializable(self):
        import json

        cfg = load_config("fly-mc-intention")
        json.dumps(cfg.to_dict())  # must not raise

    def test_bad_override_raises(self):
        with pytest.raises(ValueError):
            apply_overrides(ConfigDict({}), ["no_equals_sign"])
