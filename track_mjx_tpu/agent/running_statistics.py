"""Distributed Welford running statistics for observation normalization.

Replaces brax.training.acme.running_statistics AND the reference's masked
fork (track_mjx/agent/masked_running_statistics.py) in one module: `update`
accepts an optional `mask` freezing selected dims (masked fork :207-210) and
an optional `pmap_axis_name` for shard_map-style named-axis reduction
(:148-183). Under the pjit/global-array trainer the reductions are global
sums, so no axis name is needed — XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NestedMeanStd:
    """Mean/std pytree pair."""

    mean: Any
    std: Any


@struct.dataclass
class RunningStatisticsState(NestedMeanStd):
    """Full Welford state."""

    count: jnp.ndarray
    summed_variance: Any


def init_state(spec) -> RunningStatisticsState:
    """Initializes zero statistics shaped like `spec` (array or pytree of
    ShapeDtypeStruct/arrays)."""
    dtype = jnp.float32

    def zeros(x):
        return jnp.zeros(x.shape, dtype)

    def ones(x):
        return jnp.ones(x.shape, dtype)

    return RunningStatisticsState(
        count=jnp.zeros((), dtype),
        mean=jax.tree.map(zeros, spec),
        summed_variance=jax.tree.map(zeros, spec),
        std=jax.tree.map(ones, spec),
    )


def _validate_batch_shapes(batch, reference_sample, batch_dims):
    def validate(batch_leaf, reference_leaf):
        expected = batch_dims + reference_leaf.shape
        assert batch_leaf.shape == expected, (batch_leaf.shape, expected)

    jax.tree.map(validate, batch, reference_sample)


def update(
    state: RunningStatisticsState,
    batch: Any,
    *,
    weights: Optional[jnp.ndarray] = None,
    std_min_value: float = 1e-6,
    std_max_value: float = 1e6,
    pmap_axis_name: Optional[str] = None,
    validate_shapes: bool = True,
    mask: Optional[Any] = None,
) -> RunningStatisticsState:
    """Welford update over all leading batch dims of `batch`.

    `mask`: optional pytree of per-dim {0,1} arrays; dims with mask==1 keep
    their old statistics (the decoder-transfer "frozen proprioceptive slice"
    mechanism, reference mlp_ppo/ppo.py:363-377)."""
    batch_leaves = jax.tree.leaves(batch)
    if not batch_leaves:
        return state
    batch_shape = batch_leaves[0].shape
    # the trailing dims are the event dims
    batch_dims = batch_shape[
        : len(batch_shape) - jax.tree.leaves(state.mean)[0].ndim
    ]
    batch_axis = range(len(batch_dims))
    if weights is None:
        step_increment = jnp.prod(jnp.array(batch_dims))
    else:
        step_increment = jnp.sum(weights)
    if pmap_axis_name is not None:
        step_increment = jax.lax.psum(step_increment, axis_name=pmap_axis_name)
    count = state.count + step_increment

    if validate_shapes:
        _validate_batch_shapes(batch, state.mean, batch_dims)

    def _compute_node_statistics(mean, summed_variance, batch):
        diff_to_old_mean = batch - mean
        if weights is not None:
            expanded = jnp.reshape(
                weights, weights.shape + (1,) * (batch.ndim - weights.ndim)
            )
            diff_to_old_mean = diff_to_old_mean * expanded
        mean_update = jnp.sum(diff_to_old_mean, axis=tuple(batch_axis)) / count
        if pmap_axis_name is not None:
            mean_update = jax.lax.psum(mean_update, axis_name=pmap_axis_name)
        new_mean = mean + mean_update

        diff_to_new_mean = batch - new_mean
        variance_update = diff_to_old_mean * diff_to_new_mean
        variance_update = jnp.sum(variance_update, axis=tuple(batch_axis))
        if pmap_axis_name is not None:
            variance_update = jax.lax.psum(variance_update, axis_name=pmap_axis_name)
        # Welford's cross-term sum((x - old_mean)(x - new_mean)) is only
        # non-negative in exact arithmetic; for a (near-)constant dimension
        # f32 cancellation can drive the accumulator slightly negative and
        # sqrt() below would poison std (and then every normalized obs) with
        # NaN. Observed on contact-free toy envs whose reference obs carry
        # constant dims.
        new_summed_variance = jnp.maximum(summed_variance + variance_update, 0.0)
        return new_mean, new_summed_variance

    updated_mean, updated_summed_variance = _tree_unzip(
        jax.tree.map(
            _compute_node_statistics, state.mean, state.summed_variance, batch
        )
    )

    def compute_std(summed_variance):
        std = jnp.sqrt(summed_variance / count)
        return jnp.clip(std, std_min_value, std_max_value)

    updated_std = jax.tree.map(compute_std, updated_summed_variance)

    if mask is not None:
        keep = lambda old, new, m: jnp.where(m > 0, old, new)
        updated_mean = jax.tree.map(keep, state.mean, updated_mean, mask)
        updated_summed_variance = jax.tree.map(
            keep, state.summed_variance, updated_summed_variance, mask
        )
        updated_std = jax.tree.map(keep, state.std, updated_std, mask)

    return RunningStatisticsState(
        count=count,
        mean=updated_mean,
        summed_variance=updated_summed_variance,
        std=updated_std,
    )


def _tree_unzip(tree_of_pairs):
    """Splits a pytree of (a, b) tuples into (tree_a, tree_b)."""
    a = jax.tree.map(
        lambda pair: pair[0],
        tree_of_pairs,
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2,
    )
    b = jax.tree.map(
        lambda pair: pair[1],
        tree_of_pairs,
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2,
    )
    return a, b


def normalize(batch, mean_std: NestedMeanStd, max_abs_value=None):
    """(x - mean) / std, optionally clipped."""

    def normalize_leaf(data, mean, std):
        data = (data - mean) / std
        if max_abs_value is not None:
            data = jnp.clip(data, -max_abs_value, +max_abs_value)
        return data

    return jax.tree.map(normalize_leaf, batch, mean_std.mean, mean_std.std)


def denormalize(batch, mean_std: NestedMeanStd):
    """x * std + mean."""
    return jax.tree.map(
        lambda data, mean, std: data * std + mean,
        batch,
        mean_std.mean,
        mean_std.std,
    )
