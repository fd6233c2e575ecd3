"""Reference-clip data structures and HDF5 loaders.

Behavioral parity with the reference IO layer (track_mjx/io/load.py):
- ``ReferenceClip`` carries the same 8(+1) trajectory features (:16-38).
- ``make_multiclip_data`` reads the stac-mjx flat HDF5 layout and reshapes to
  (clips, frames, dims) using n_frames_per_clip from the embedded YAML config
  (:105-137).
- ``load_reference_clip_data`` reads the grouped "all_clips" layout (:140-184).
- ``load_data`` tries stac-mjx first, falls back to the grouped format
  (:61-74).
- train/test split and clip selection utilities (:187-278).

TPU note: clips are loaded as host numpy and promoted to device arrays once,
at env construction; the env then tree-indexes them on device.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Optional, Tuple, Union

import h5py
import jax.numpy as jnp
import numpy as np
import yaml
from flax import struct


@struct.dataclass
class ReferenceClip:
    """Trajectory features used by the tracking task (flax pytree)."""

    # qpos split
    position: jnp.ndarray
    quaternion: jnp.ndarray
    joints: jnp.ndarray
    # xpos
    body_positions: jnp.ndarray
    # qvel split (inferred)
    velocity: jnp.ndarray
    angular_velocity: jnp.ndarray
    joints_velocity: jnp.ndarray
    # xquat
    body_quaternions: jnp.ndarray
    # original clip order index (used to recover per-clip metadata)
    original_clip_idx: Optional[jnp.ndarray] = None


def load_data(data_path: Union[str, Path]) -> ReferenceClip:
    """Loads clips, trying the stac-mjx flat format then the grouped format."""
    try:
        return make_multiclip_data(data_path)
    except KeyError:
        logging.info(
            "Loading from stac-mjx format failed; trying the ReferenceClip format."
        )
        return load_reference_clip_data(data_path)


def make_singleclip_data(traj_data_path: Union[str, Path]) -> ReferenceClip:
    """Single-clip loader from flat qpos/qvel/xpos/xquat datasets."""
    with h5py.File(traj_data_path, "r") as data:
        qpos = jnp.array(data["qpos"][()])
        qvel = jnp.array(data["qvel"][()])
        xpos = jnp.array(data["xpos"][()])
        xquat = jnp.array(data["xquat"][()])
    return ReferenceClip(
        position=qpos[:, :3],
        quaternion=qpos[:, 3:7],
        joints=qpos[:, 7:],
        body_positions=xpos,
        velocity=qvel[:, :3],
        angular_velocity=qvel[:, 3:6],
        joints_velocity=qvel[:, 6:],
        body_quaternions=xquat,
    )


def make_multiclip_data(
    traj_data_path: Union[str, Path], n_frames_per_clip: Optional[int] = None
) -> ReferenceClip:
    """stac-mjx flat HDF5 -> (clips, frames, dims) ReferenceClip."""

    def reshape_frames(arr, clip_len):
        flat = arr[()]
        return jnp.array(
            flat.reshape(flat.shape[0] // clip_len, clip_len, *flat.shape[1:])
        )

    with h5py.File(traj_data_path, "r") as data:
        if n_frames_per_clip is None:
            yaml_str = data["config"][()]
            if isinstance(yaml_str, bytes):
                yaml_str = yaml_str.decode("utf-8")
            config = yaml.safe_load(yaml_str)
            n_frames_per_clip = config["stac"]["n_frames_per_clip"]
        batch_qpos = reshape_frames(data["qpos"], n_frames_per_clip)
        batch_xpos = reshape_frames(data["xpos"], n_frames_per_clip)
        batch_qvel = reshape_frames(data["qvel"], n_frames_per_clip)
        batch_xquat = reshape_frames(data["xquat"], n_frames_per_clip)
    return ReferenceClip(
        position=batch_qpos[:, :, :3],
        quaternion=batch_qpos[:, :, 3:7],
        joints=batch_qpos[:, :, 7:],
        body_positions=batch_xpos,
        velocity=batch_qvel[:, :, :3],
        angular_velocity=batch_qvel[:, :, 3:6],
        joints_velocity=batch_qvel[:, :, 6:],
        body_quaternions=batch_xquat,
    )


_CLIP_KEYS = (
    "angular_velocity",
    "body_positions",
    "body_quaternions",
    "joints",
    "joints_velocity",
    "position",
    "quaternion",
    "velocity",
)


def load_reference_clip_data(
    filepath: Union[str, Path], group_name: str = "all_clips"
) -> ReferenceClip:
    """Grouped-HDF5 loader ("all_clips/<feature>" datasets, fly format)."""
    try:
        with h5py.File(filepath, "r") as f:
            if group_name not in f:
                raise KeyError(f"Group '{group_name}' not found in the HDF5 file.")
            group = f[group_name]
            data = {}
            for key in _CLIP_KEYS:
                if key not in group:
                    raise KeyError(
                        f"Dataset '{key}' not found in group '{group_name}'."
                    )
                data[key] = jnp.array(group[key][()])
            return ReferenceClip(**data)
    except FileNotFoundError:
        raise FileNotFoundError(f"File not found: {filepath}")
    except OSError as e:
        raise OSError(f"Error reading HDF5 file: {filepath} - {e}")


def save_reference_clip_data(
    clip: ReferenceClip, filepath: Union[str, Path], group_name: str = "all_clips"
) -> None:
    """Writes a ReferenceClip in the grouped-HDF5 layout (round-trips with
    load_reference_clip_data). Framework addition: the reference has no
    writer, but tests and synthetic-data tooling need one."""
    with h5py.File(filepath, "w") as f:
        group = f.create_group(group_name)
        for key in _CLIP_KEYS:
            group.create_dataset(key, data=np.asarray(getattr(clip, key)))


def generate_train_test_split(
    data: ReferenceClip, test_ratio: float = 0.1, seed: Optional[int] = None
) -> Tuple[ReferenceClip, ReferenceClip]:
    """Random clip-level split; returns (train, test) with sorted indices."""
    num_clips = data.position.shape[0]
    indices = np.arange(num_clips)
    rng = np.random if seed is None else np.random.RandomState(seed)
    test_idx = rng.choice(indices, size=int(num_clips * test_ratio), replace=False)
    train_idx = indices[~np.isin(indices, test_idx)]
    train_idx.sort()
    test_idx.sort()
    return select_clips(data, train_idx), select_clips(data, test_idx)


def load_clips_metadata(traj_data_path: Union[str, Path]) -> list:
    """Behavior-group metadata from stac-mjx snips_order paths."""
    with h5py.File(traj_data_path, "r") as data:
        yaml_str = data["config"][()]
        if isinstance(yaml_str, bytes):
            yaml_str = yaml_str.decode("utf-8")
        config = yaml.safe_load(yaml_str)
    pattern = re.compile(r"/([^/]+)_([0-9]+)\.p$")
    clip_metadata = []
    for path in config["model"]["snips_order"]:
        match = pattern.search(path)
        if match:
            name, number = match.groups()
            clip_metadata.append((name, int(number)))
    return clip_metadata


def sub_sample_training_set(
    train_idx: np.ndarray, train_ratio: float = 0.1, seed: Optional[int] = None
) -> np.ndarray:
    """Randomly subsamples training clip indices without replacement."""
    rng = np.random if seed is None else np.random.RandomState(seed)
    sample_size = int(len(train_idx) * train_ratio)
    sampled_idx = rng.choice(train_idx, size=sample_size, replace=False)
    sampled_idx.sort()
    return sampled_idx


def select_clips(clips: ReferenceClip, indices: np.ndarray) -> ReferenceClip:
    """Gathers a subset of clips, recording original indices."""
    indices = np.array(indices)
    return ReferenceClip(
        position=clips.position[indices],
        quaternion=clips.quaternion[indices],
        joints=clips.joints[indices],
        body_positions=clips.body_positions[indices],
        velocity=clips.velocity[indices],
        angular_velocity=clips.angular_velocity[indices],
        joints_velocity=clips.joints_velocity[indices],
        body_quaternions=clips.body_quaternions[indices],
        original_clip_idx=jnp.array(indices[:, None]),
    )
