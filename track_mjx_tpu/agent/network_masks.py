"""Parameter-freeze masks for decoder-transfer training (behavioral parity:
track_mjx/agent/network_masks.py:6-19)."""

from __future__ import annotations

import jax


def create_decoder_mask(params) -> object:
    """Pytree bool mask marking decoder params frozen for
    optax.transforms.freeze: True = frozen (decoder), False = trainable."""

    def mask_fn(path, _):
        return any(
            getattr(p, "key", getattr(p, "name", None)) == "decoder" for p in path
        )

    return jax.tree_util.tree_map_with_path(mask_fn, params)
