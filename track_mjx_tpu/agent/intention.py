"""Shared intention-bottleneck (CoMic-style VAE) policy architecture.

One implementation serving both pipelines: the observation is split into a
reference-trajectory slice (what to do) and an egocentric slice (body state),
the reference slice is compressed through a variational "intention" latent,
and a decoder — feedforward (MLP pipeline) or recurrent (LSTM pipeline) —
maps [intention, egocentric] to action-distribution parameters.

Behavioral contract (reference:
track_mjx/agent/{mlp,lstm}_ppo/intention_network.py): Dense→silu→LayerNorm
trunks, mean/logvar heads, reparameterized sampling in the MLP pipeline,
mean-as-latent in the LSTM pipeline (the reference disables reparameterization
there), stacked LSTMCells + Dense projection for the recurrent decoder.
Parameter-tree top-level keys ("encoder", "decoder" / "lstm_decoder") are
load-bearing for decoder freezing and transfer (agent/network_masks.py,
mlp_ppo/ppo.py decoder splice) and are preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.networks import ActivationFn, FeedForwardNetwork, Initializer

_DEFAULT_INIT = jax.nn.initializers.lecun_uniform()


class NormedTrunk(nn.Module):
    """Stack of Dense → activation → LayerNorm blocks.

    ``skip_final_norm`` leaves the last Dense raw (no activation/LayerNorm) —
    the decoder's output layer emits distribution parameters directly.
    Each normalized block's output is recorded in ``taps`` when requested.
    """

    widths: Sequence[int]
    activation: ActivationFn = nn.silu
    kernel_init: Initializer = _DEFAULT_INIT
    use_bias: bool = True
    skip_final_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, record_taps: bool = False):
        taps = {}
        last = len(self.widths) - 1
        for i, width in enumerate(self.widths):
            x = nn.Dense(
                width,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.use_bias,
            )(x)
            if self.skip_final_norm and i == last:
                break
            x = nn.LayerNorm()(self.activation(x))
            if record_taps:
                taps[f"layer_{i}"] = x
        return x, taps


class Encoder(nn.Module):
    """Reference observations → diagonal-Gaussian intention (mean, logvar)."""

    layer_sizes: Sequence[int]
    latents: int
    activation: ActivationFn = nn.silu
    kernel_init: Initializer = _DEFAULT_INIT
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_activation: bool = False):
        x, taps = NormedTrunk(
            widths=self.layer_sizes,
            activation=self.activation,
            kernel_init=self.kernel_init,
            use_bias=self.bias,
            name="trunk",
        )(x, record_taps=get_activation)
        mean = nn.Dense(self.latents, name="fc2_mean")(x)
        logvar = nn.Dense(self.latents, name="fc2_logvar")(x)
        if get_activation:
            taps.update(mean=mean, logvar=logvar)
            return (mean, logvar), taps
        return mean, logvar


class Decoder(nn.Module):
    """[intention, egocentric obs] → action-distribution parameters."""

    layer_sizes: Sequence[int]  # hidden widths + output width
    activation: ActivationFn = nn.silu
    kernel_init: Initializer = _DEFAULT_INIT
    activate_final: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_activation: bool = False):
        x, taps = NormedTrunk(
            widths=self.layer_sizes,
            activation=self.activation,
            kernel_init=self.kernel_init,
            use_bias=self.bias,
            skip_final_norm=not self.activate_final,
            name="trunk",
        )(x, record_taps=get_activation)
        return x, taps


class RecurrentDecoder(nn.Module):
    """Stacked LSTM cells + Dense projection to distribution parameters.

    The carry is a (h, c) pair, each [batch, layer, hidden] — layer-stacked so
    the whole carry travels as two arrays through scans and env-state infos.
    """

    out_size: int
    hidden_size: int = 128
    num_layers: int = 2
    kernel_init: Initializer = _DEFAULT_INIT
    bias: bool = True

    @nn.compact
    def __call__(self, x, carry, get_activation: bool = False):
        h_stack, c_stack = carry
        next_h, next_c = [], []
        for layer in range(self.num_layers):
            cell_carry = (c_stack[:, layer, :], h_stack[:, layer, :])
            cell_carry, x = nn.LSTMCell(
                features=self.hidden_size,
                name=f"lstm_{layer}",
                kernel_init=self.kernel_init,
            )(cell_carry, x)
            next_c.append(cell_carry[0])
            next_h.append(cell_carry[1])
        x = nn.Dense(
            self.out_size,
            name="lstm_projection",
            kernel_init=self.kernel_init,
            use_bias=self.bias,
        )(x)
        new_carry = (jnp.stack(next_h, axis=1), jnp.stack(next_c, axis=1))
        taps = {"lstm_projection": x} if get_activation else {}
        return x, new_carry, taps


def sample_latent(rng, mean, logvar):
    """Reparameterized draw from N(mean, exp(logvar))."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, logvar.shape)


class IntentionPolicy(nn.Module):
    """Encoder + decoder with the intention bottleneck in between.

    ``recurrent`` selects the decoder backend; the recurrent variant threads
    an LSTM carry and always uses the posterior mean as the latent (reference
    parity: lstm_ppo/intention_network.py:145-169). The feedforward variant
    samples unless ``deterministic``.
    """

    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    reference_obs_size: int
    latents: int = 60
    recurrent: bool = False
    hidden_size: int = 128
    num_lstm_layers: int = 2

    def setup(self):
        self.encoder = Encoder(
            layer_sizes=self.encoder_layers, latents=self.latents
        )
        if self.recurrent:
            self.lstm_decoder = RecurrentDecoder(
                out_size=self.decoder_layers[-1],
                hidden_size=self.hidden_size,
                num_layers=self.num_lstm_layers,
            )
        else:
            self.decoder = Decoder(layer_sizes=self.decoder_layers)

    def _encode(self, obs, rng, deterministic, get_activation):
        reference = obs[..., : self.reference_obs_size]
        egocentric = obs[..., self.reference_obs_size :]
        if get_activation:
            (mean, logvar), enc_taps = self.encoder(
                reference, get_activation=True
            )
        else:
            mean, logvar = self.encoder(reference)
            enc_taps = {}
        if self.recurrent or deterministic:
            z = mean
        else:
            z = sample_latent(rng, mean, logvar)
        return reference, egocentric, mean, logvar, z, enc_taps

    def __call__(
        self,
        obs: jnp.ndarray,
        key: jax.Array,
        hidden_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        deterministic: bool = False,
        get_activation: bool = False,
    ):
        _, sample_rng = jax.random.split(key)
        reference, egocentric, mean, logvar, z, enc_taps = self._encode(
            obs, sample_rng, deterministic, get_activation
        )
        decoder_in = jnp.concatenate([z, egocentric], axis=-1)

        if self.recurrent:
            action, new_carry, dec_taps = self.lstm_decoder(
                decoder_in, hidden_state, get_activation=get_activation
            )
            if get_activation:
                taps = {
                    "encoder": enc_taps,
                    "decoder": dec_taps,
                    "intention": z,
                    "hidden_state": new_carry,
                }
                return action, mean, logvar, new_carry, taps
            return action, mean, logvar, new_carry

        action, dec_taps = self.decoder(
            decoder_in, get_activation=get_activation
        )
        if get_activation:
            taps = {
                "encoder": enc_taps,
                "decoder": dec_taps,
                "egocentric_obs": egocentric,
                "traj_obs": reference,
                "intention": z,
            }
            return action, mean, logvar, taps
        return action, mean, logvar


def _tree_cast(tree, dtype):
    """Casts every floating leaf; int leaves (e.g. PRNG keys) pass through."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def make_feedforward_intention_policy(
    action_param_size: int,
    latent_size: int,
    total_obs_size: int,
    reference_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    encoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Feedforward intention policy with normalizer preprocessing."""
    module = IntentionPolicy(
        encoder_layers=tuple(encoder_hidden_layer_sizes),
        decoder_layers=tuple(decoder_hidden_layer_sizes) + (action_param_size,),
        reference_obs_size=reference_obs_size,
        latents=latent_size,
    )

    def apply(
        processor_params,
        policy_params,
        obs,
        key,
        deterministic: bool = False,
        get_activation: bool = False,
        compute_dtype=None,
    ):
        """compute_dtype: run the network body in this dtype (e.g. bf16 for
        TPU rollout — the MXU's native precision) while the normalizer stays
        f32 and every output is cast back to f32. Master params are untouched;
        the per-apply cast is loop-invariant and hoisted out of unroll scans
        by XLA."""
        obs = preprocess_observations_fn(obs, processor_params)
        if compute_dtype is None:
            return module.apply(
                policy_params,
                obs=obs,
                key=key,
                deterministic=deterministic,
                get_activation=get_activation,
            )
        out = module.apply(
            _tree_cast(policy_params, compute_dtype),
            obs=obs.astype(compute_dtype),
            key=key,
            deterministic=deterministic,
            get_activation=get_activation,
        )
        return _tree_cast(out, jnp.float32)

    probe_obs = jnp.zeros((1, total_obs_size))
    probe_key = jax.random.PRNGKey(0)
    return FeedForwardNetwork(
        init=lambda key: module.init(key, probe_obs, probe_key), apply=apply
    )


def make_recurrent_intention_policy(
    action_param_size: int,
    latent_size: int,
    hidden_state_size: int,
    hidden_layer_num: int,
    total_obs_size: int,
    reference_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    encoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
):
    """Recurrent intention policy; init takes the initial carry too."""
    module = IntentionPolicy(
        encoder_layers=tuple(encoder_hidden_layer_sizes),
        decoder_layers=tuple(decoder_hidden_layer_sizes) + (action_param_size,),
        reference_obs_size=reference_obs_size,
        latents=latent_size,
        recurrent=True,
        hidden_size=hidden_state_size,
        num_lstm_layers=hidden_layer_num,
    )

    def apply(
        processor_params,
        policy_params,
        obs,
        key,
        hidden_state,
        get_activation,
        compute_dtype=None,
    ):
        """compute_dtype: as in make_feedforward_intention_policy — bf16
        network body for TPU rollout; the LSTM carry is cast back to f32 on
        the way out, so the recurrent state accumulates at full precision."""
        obs = preprocess_observations_fn(obs, processor_params)
        if compute_dtype is None:
            return module.apply(
                policy_params,
                obs=obs,
                key=key,
                hidden_state=hidden_state,
                get_activation=get_activation,
            )
        out = module.apply(
            _tree_cast(policy_params, compute_dtype),
            obs=obs.astype(compute_dtype),
            key=key,
            hidden_state=_tree_cast(hidden_state, compute_dtype),
            get_activation=get_activation,
        )
        return _tree_cast(out, jnp.float32)

    probe_obs = jnp.zeros((1, total_obs_size))
    probe_key = jax.random.PRNGKey(0)
    return (
        module,
        lambda key, hidden_state: module.init(
            key, probe_obs, probe_key, hidden_state
        ),
        apply,
    )


def make_decoder_only_policy(
    param_size: int,
    decoder_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Standalone decoder for checkpoint-driven control: the normalizer
    applies only to the trailing proprioceptive slice of [z, egocentric]
    (the latent dims were never normalized during training)."""
    module = Decoder(
        layer_sizes=tuple(decoder_hidden_layer_sizes) + (param_size,)
    )

    def apply(processor_params, policy_params, obs):
        n_norm = processor_params.mean.shape[-1]
        normed_tail = preprocess_observations_fn(
            obs[..., -n_norm:], processor_params
        )
        obs = jnp.concatenate([obs[..., :-n_norm], normed_tail], axis=-1)
        return module.apply(policy_params, x=obs)

    probe_obs = jnp.zeros((1, decoder_obs_size))
    return FeedForwardNetwork(
        init=lambda key: module.init(key, probe_obs), apply=apply
    )
