"""Checkpoint round-trip (script equivalent of
notebooks/rollout_from_checkpoint.ipynb): load a checkpoint, rebuild the env
and policy from its stored config, generate a jitted rollout (vmap-able over
clip indices), optionally render, and save/load the rollout HDF5.

Usage: python examples/02_rollout_from_checkpoint.py <checkpoint_dir> [clip_idx]
"""

import sys

import jax
import numpy as np

from track_mjx_tpu.agent import checkpointing
from track_mjx_tpu.analysis import rollout as rollout_lib
from track_mjx_tpu.analysis import utils as h5utils
from track_mjx_tpu.analysis.render import gl_available


def main():
    ckpt_path = sys.argv[1]
    clip_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    out = checkpointing.load_checkpoint_for_eval(ckpt_path)
    cfg, policy = out["cfg"], out["policy"]
    env = rollout_lib.create_environment(cfg)
    inference_fn = checkpointing.load_inference_fn(
        cfg, policy, deterministic=True, get_activation=False
    )
    generate_rollout = rollout_lib.create_rollout_generator(
        cfg,
        env,
        inference_fn,
        model="lstm" if cfg["train_setup"]["train_config"]["use_lstm"] else "mlp",
        log_metrics=True,
    )

    result = generate_rollout(clip_idx)
    print("rollout keys:", sorted(result.keys()))
    print("qposes_rollout:", result["qposes_rollout"].shape)
    print("mean reward:", float(np.mean(np.asarray(result["state_rewards"]))))

    # batched rollouts over several clips via vmap
    n = min(4, env._n_clips)
    batched = jax.vmap(lambda i: generate_rollout(i))(jax.numpy.arange(n))
    print("vmapped qposes:", batched["qposes_rollout"].shape)

    h5utils.save_to_h5py("rollout.h5", {k: np.asarray(v) for k, v in
                                        result.items() if hasattr(v, "shape")})
    loaded = h5utils.load_from_h5py("rollout.h5")
    print("rollout.h5 round-trip OK:", sorted(loaded.keys()))

    if gl_available():
        from track_mjx_tpu.analysis.render import render_rollout

        frames, fps = render_rollout(cfg, result)
        import imageio

        imageio.mimsave("rollout.mp4", frames, fps=int(fps))
        print("wrote rollout.mp4")
    else:
        print("no GL backend; skipping video")


if __name__ == "__main__":
    main()
