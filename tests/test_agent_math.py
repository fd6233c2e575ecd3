"""Unit tests for agent-layer numerics: distribution, GAE, running stats,
losses, schedules — checked against hand-computed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from track_mjx_tpu.agent import running_statistics
from track_mjx_tpu.agent.distribution import NormalTanhDistribution
from track_mjx_tpu.agent.mlp_ppo import losses


class TestNormalTanhDistribution:
    def setup_method(self):
        self.dist = NormalTanhDistribution(event_size=3)
        self.params = jnp.array([0.1, -0.2, 0.5, 0.0, 0.3, -0.1])

    def test_param_size(self):
        assert self.dist.param_size == 6

    def test_mode_is_tanh_loc(self):
        np.testing.assert_allclose(
            np.asarray(self.dist.mode(self.params)),
            np.tanh([0.1, -0.2, 0.5]),
            rtol=1e-6,
        )

    def test_log_prob_matches_manual(self):
        raw = jnp.array([0.2, -0.1, 0.4])
        loc = np.array([0.1, -0.2, 0.5])
        scale = np.log1p(np.exp([0.0, 0.3, -0.1])) + 0.001  # softplus + min_std
        normal_lp = (
            -0.5 * ((np.asarray(raw) - loc) / scale) ** 2
            - 0.5 * np.log(2 * np.pi)
            - np.log(scale)
        )
        # tanh log-det-jacobian in softplus form
        x = np.asarray(raw)
        ldj = 2.0 * (np.log(2.0) - x - np.log1p(np.exp(-2.0 * x)))
        expected = (normal_lp - ldj).sum()
        got = float(self.dist.log_prob(self.params, raw))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_sample_in_range(self):
        s = self.dist.sample(self.params, jax.random.PRNGKey(0))
        assert (np.abs(np.asarray(s)) <= 1.0).all()

    def test_postprocess_inverse(self):
        x = jnp.array([0.3, -0.7, 0.0])
        y = self.dist.postprocess(x)
        np.testing.assert_allclose(
            np.asarray(self.dist.inverse_postprocess(y)), np.asarray(x), rtol=1e-5
        )


class TestGAE:
    def test_matches_manual_recursion(self):
        T, B = 5, 2
        rng = np.random.RandomState(0)
        rewards = rng.randn(T, B).astype(np.float32)
        values = rng.randn(T, B).astype(np.float32)
        bootstrap = rng.randn(B).astype(np.float32)
        termination = np.zeros((T, B), np.float32)
        termination[3, 0] = 1.0
        truncation = np.zeros((T, B), np.float32)
        truncation[2, 1] = 1.0
        lam, gamma = 0.95, 0.99

        vs, adv = losses.compute_gae(
            jnp.array(truncation),
            jnp.array(termination),
            jnp.array(rewards),
            jnp.array(values),
            jnp.array(bootstrap),
            lambda_=lam,
            discount=gamma,
        )

        # manual reverse recursion (reference :69-100 semantics)
        tmask = 1 - truncation
        values_tp1 = np.concatenate([values[1:], bootstrap[None]], 0)
        deltas = (rewards + gamma * (1 - termination) * values_tp1 - values) * tmask
        acc = np.zeros(B, np.float32)
        out = np.zeros((T, B), np.float32)
        for t in reversed(range(T)):
            acc = deltas[t] + gamma * (1 - termination[t]) * tmask[t] * lam * acc
            out[t] = acc
        vs_manual = out + values
        vs_tp1 = np.concatenate([vs_manual[1:], bootstrap[None]], 0)
        adv_manual = (
            rewards + gamma * (1 - termination) * vs_tp1 - values
        ) * tmask
        np.testing.assert_allclose(np.asarray(vs), vs_manual, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(adv), adv_manual, rtol=1e-5)


class TestRunningStatistics:
    def test_welford_matches_numpy(self):
        state = running_statistics.init_state(
            jax.ShapeDtypeStruct((4,), jnp.float32)
        )
        rng = np.random.RandomState(1)
        b1 = rng.randn(10, 4).astype(np.float32)
        b2 = rng.randn(7, 4).astype(np.float32)
        state = running_statistics.update(state, jnp.array(b1))
        state = running_statistics.update(state, jnp.array(b2))
        allb = np.concatenate([b1, b2])
        np.testing.assert_allclose(np.asarray(state.mean), allb.mean(0), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(state.std), allb.std(0), rtol=1e-3
        )
        assert float(state.count) == 17

    def test_constant_dim_never_nans(self):
        """A (near-)constant dimension must keep std at the clip floor, not
        NaN: Welford's cross-term sum can go slightly negative under f32
        cancellation and an unclamped sqrt poisons the whole normalizer
        (observed on contact-free envs with constant reference-obs dims;
        the fix clamps summed_variance at 0)."""
        state = running_statistics.init_state(
            jax.ShapeDtypeStruct((3,), jnp.float32)
        )
        rng = np.random.RandomState(2)
        for _ in range(20):
            batch = rng.randn(16, 3).astype(np.float32)
            batch[:, 0] = 7.125  # exactly constant dim
            batch[:, 1] = 3.0 + rng.randn(16).astype(np.float32) * 1e-6
            state = running_statistics.update(state, jnp.array(batch))
        std = np.asarray(state.std)
        sv = np.asarray(state.summed_variance)
        assert np.isfinite(std).all(), std
        assert (sv >= 0).all(), sv
        assert std[0] == pytest.approx(1e-6)  # clip floor, not NaN

    def test_mask_freezes_dims(self):
        state = running_statistics.init_state(
            jax.ShapeDtypeStruct((4,), jnp.float32)
        )
        batch = jnp.ones((5, 4)) * 3.0
        mask = jnp.array([0.0, 0.0, 1.0, 1.0])
        state = running_statistics.update(state, batch, mask=mask)
        m = np.asarray(state.mean)
        assert m[0] == pytest.approx(3.0)
        assert m[2] == pytest.approx(0.0)  # frozen at init value

    def test_normalize_denormalize_roundtrip(self):
        state = running_statistics.init_state(
            jax.ShapeDtypeStruct((3,), jnp.float32)
        )
        batch = jnp.array(np.random.RandomState(2).randn(20, 3), jnp.float32)
        state = running_statistics.update(state, batch)
        normed = running_statistics.normalize(batch, state)
        back = running_statistics.denormalize(normed, state)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(batch), rtol=1e-4, atol=1e-6
        )

    def test_multidevice_sharded_update_matches_global(self):
        """Batch sharded over the 8-device CPU mesh must give the same stats
        as a single-device update (the pjit replacement for psum)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from track_mjx_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.create_mesh()
        batch = jnp.array(np.random.RandomState(3).randn(16, 4), jnp.float32)
        state = running_statistics.init_state(
            jax.ShapeDtypeStruct((4,), jnp.float32)
        )
        sharded = jax.device_put(batch, NamedSharding(mesh, P("batch")))
        out_sharded = jax.jit(running_statistics.update)(state, sharded)
        out_local = running_statistics.update(state, batch)
        np.testing.assert_allclose(
            np.asarray(out_sharded.mean), np.asarray(out_local.mean), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_sharded.std), np.asarray(out_local.std), rtol=1e-5
        )


class TestSchedules:
    def test_linear_ramp(self):
        sched = losses.create_ramp_schedule(
            max_value=0.1, min_value=1e-4, ramp_steps=10, schedule="linear"
        )
        assert float(sched(0)) == pytest.approx(1e-4 * 0.1, abs=1e-6)
        assert float(sched(10)) == pytest.approx(0.1)
        assert float(sched(100)) == pytest.approx(0.1)

    def test_cyclic_schedules_bounded(self):
        for kind in ("cosine", "sine"):
            sched = losses.create_ramp_schedule(
                max_value=0.1, min_value=0.01, period=45, schedule=kind
            )
            vals = np.array([float(sched(s)) for s in range(100)])
            assert vals.min() >= 0.0
            assert vals.max() <= 0.21  # midpoint + min + amplitude bound

    def test_invalid_schedule_raises(self):
        with pytest.raises(ValueError):
            losses.create_ramp_schedule(schedule="nope")(0)


class TestPPOLossShapes:
    def test_loss_runs_and_is_finite(self):
        """Minimal end-to-end loss eval with a tiny intention network."""
        from track_mjx_tpu.agent import types
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks

        obs_size, ref_size, act_size = 12, 8, 3
        net = ppo_networks.make_intention_ppo_networks(
            obs_size,
            ref_size,
            act_size,
            intention_latent_size=4,
            encoder_hidden_layer_sizes=(16,),
            decoder_hidden_layer_sizes=(16,),
            value_hidden_layer_sizes=(16,),
        )
        key = jax.random.PRNGKey(0)
        params = losses.PPONetworkParams(
            policy=net.policy_network.init(key),
            value=net.value_network.init(key),
        )
        B, T = 4, 5
        rng = np.random.RandomState(0)
        data = types.Transition(
            observation=jnp.array(rng.randn(B, T, obs_size), jnp.float32),
            action=jnp.array(rng.randn(B, T, act_size), jnp.float32),
            reward=jnp.array(rng.randn(B, T), jnp.float32),
            discount=jnp.ones((B, T), jnp.float32),
            next_observation=jnp.array(rng.randn(B, T, obs_size), jnp.float32),
            extras={
                "state_extras": {"truncation": jnp.zeros((B, T))},
                "policy_extras": {
                    "raw_action": jnp.array(
                        rng.randn(B, T, act_size), jnp.float32
                    ),
                    "log_prob": jnp.array(rng.randn(B, T), jnp.float32),
                },
            },
        )
        loss, metrics = losses.compute_ppo_loss(
            params, None, data, jax.random.PRNGKey(1), 0, net
        )
        assert np.isfinite(float(loss))
        assert set(metrics) == {
            "total_loss",
            "policy_loss",
            "v_loss",
            "kl_latent_loss",
            "entropy_loss",
            "kl_weight",
        }
