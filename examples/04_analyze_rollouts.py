"""Saved-rollout analysis (script equivalent of
notebooks/analyze_saved_rollouts.ipynb): load rollout HDF5s, summarize reward
components, and build a PCA-of-intention progression video.

Usage: python examples/04_analyze_rollouts.py <rollout.h5> [out.mp4]
"""

import sys

import numpy as np

from track_mjx_tpu.analysis import utils as h5utils
from track_mjx_tpu.analysis.render import plot_pca_intention_video


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "intention_pca.mp4"
    data = h5utils.load_from_h5py(path)
    print("keys:", sorted(data.keys()))
    if "state_rewards" in data:
        r = np.asarray(data["state_rewards"])
        print(f"rewards: mean={r.mean():.3f} min={r.min():.3f} max={r.max():.3f}")
    if "rollout_metrics" in data:
        for k, v in sorted(data["rollout_metrics"].items()):
            print(f"  {k}: mean={np.asarray(v).mean():.4f}")
    # intention trajectory: either saved activations or latent means
    intentions = None
    if "activations" in data and isinstance(data["activations"], dict):
        intentions = data["activations"].get("intention")
    if intentions is None and "latent_means" in data:
        intentions = data["latent_means"]
    if intentions is not None:
        print("writing PCA intention video to", out)
        plot_pca_intention_video(np.asarray(intentions), out)
    else:
        print("no intention data in this rollout; skipping PCA video")


if __name__ == "__main__":
    main()
