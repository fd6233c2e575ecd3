"""stac-mjx flat-HDF5 format coverage (VERDICT round 1, item 7).

No real mocap file exists in this environment, so a synthetic fixture file is
written in the exact flat layout stac-mjx produces (reference
track_mjx/io/load.py:105-137): top-level qpos/xpos/qvel/xquat datasets of
shape (n_clips * clip_len, dims) plus a `config` dataset holding the YAML
string with stac.n_frames_per_clip and model.snips_order."""

import h5py
import numpy as np
import pytest
import yaml

from track_mjx_tpu.io import load as load_lib


N_CLIPS, CLIP_LEN, NQ, NV, NBODY = 3, 20, 12, 11, 5


@pytest.fixture()
def stac_file(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "stac_flat.h5"
    cfg = {
        "stac": {"n_frames_per_clip": CLIP_LEN},
        "model": {
            "snips_order": [
                "/data/snips/walk_3.p",
                "/data/snips/groom_12.p",
                "/data/snips/rear_0.p",
                "/data/snips/not-matching.txt",
            ]
        },
    }
    with h5py.File(path, "w") as f:
        f.create_dataset("qpos", data=rng.randn(N_CLIPS * CLIP_LEN, NQ))
        f.create_dataset("qvel", data=rng.randn(N_CLIPS * CLIP_LEN, NV))
        f.create_dataset("xpos", data=rng.randn(N_CLIPS * CLIP_LEN, NBODY, 3))
        f.create_dataset("xquat", data=rng.randn(N_CLIPS * CLIP_LEN, NBODY, 4))
        f.create_dataset("config", data=yaml.safe_dump(cfg))
    return path


def test_make_multiclip_data_reshapes(stac_file):
    clips = load_lib.make_multiclip_data(stac_file)
    assert clips.position.shape == (N_CLIPS, CLIP_LEN, 3)
    assert clips.quaternion.shape == (N_CLIPS, CLIP_LEN, 4)
    assert clips.joints.shape == (N_CLIPS, CLIP_LEN, NQ - 7)
    assert clips.body_positions.shape == (N_CLIPS, CLIP_LEN, NBODY, 3)
    assert clips.velocity.shape == (N_CLIPS, CLIP_LEN, 3)
    assert clips.angular_velocity.shape == (N_CLIPS, CLIP_LEN, 3)
    assert clips.joints_velocity.shape == (N_CLIPS, CLIP_LEN, NV - 6)
    assert clips.body_quaternions.shape == (N_CLIPS, CLIP_LEN, NBODY, 4)
    # row-major reshape: clip 1, frame 0 == flat frame CLIP_LEN
    with h5py.File(stac_file, "r") as f:
        flat_qpos = f["qpos"][()]
    np.testing.assert_allclose(
        np.asarray(clips.position)[1, 0], flat_qpos[CLIP_LEN, :3]
    )
    np.testing.assert_allclose(
        np.asarray(clips.joints)[2, 5], flat_qpos[2 * CLIP_LEN + 5, 7:]
    )


def test_make_multiclip_explicit_length_overrides_yaml(stac_file):
    clips = load_lib.make_multiclip_data(stac_file, n_frames_per_clip=10)
    assert clips.position.shape == (N_CLIPS * 2, 10, 3)


def test_load_data_prefers_stac_format(stac_file):
    clips = load_lib.load_data(stac_file)
    assert clips.position.shape == (N_CLIPS, CLIP_LEN, 3)


def test_load_clips_metadata_snips_order(stac_file):
    meta = load_lib.load_clips_metadata(stac_file)
    # the regex keeps only "<name>_<number>.p" entries
    assert meta == [("walk", 3), ("groom", 12), ("rear", 0)]


def test_load_data_falls_back_to_grouped(tmp_path):
    """A grouped-format file (no top-level qpos) routes to the grouped
    loader through load_data's KeyError fallback."""
    from track_mjx_tpu.io.synthetic import synthesize_clips  # noqa: F401  (doc)

    rng = np.random.RandomState(1)
    clip = load_lib.ReferenceClip(
        position=rng.randn(2, 4, 3),
        quaternion=rng.randn(2, 4, 4),
        joints=rng.randn(2, 4, 5),
        body_positions=rng.randn(2, 4, 3, 3),
        velocity=rng.randn(2, 4, 3),
        angular_velocity=rng.randn(2, 4, 3),
        joints_velocity=rng.randn(2, 4, 5),
        body_quaternions=rng.randn(2, 4, 3, 4),
    )
    path = tmp_path / "grouped.h5"
    load_lib.save_reference_clip_data(clip, path)
    out = load_lib.load_data(path)
    np.testing.assert_allclose(np.asarray(out.position), clip.position)
