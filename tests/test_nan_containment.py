"""Regression tests for NaN containment beyond the training stream.

Round-4 diagnosis (BASELINE.md "NaN containment boundaries"): the env's NaN
guard sanitizes only reward/obs (reference parity,
single_clip_tracking.py:287-293). Two leaks existed downstream of it:

1. eval/episode_* aggregation: the step on which a physics blow-up forces
   done still carries NaN/inf TERM metrics (pos_reward etc.), and the
   EvalWrapper accumulated them unsanitized — one poisoned step turned the
   whole episode aggregate NaN (observed in the round-3 bf16 A/B artifacts:
   20 NaN eval/episode_* metrics at a random-policy eval).
2. latents/* logging: the full-clip logging rollout keeps stepping past
   done; nan_to_num leaves inf-magnitude observations at float-max, which
   overflows inside the policy MLP (LayerNorm of inf = NaN), so every frame
   after a blow-up has NaN latents and the unmasked mean/std over frames
   went NaN for ALL latent dims (observed: 240 NaN latents/* stats).
"""

import jax
import jax.numpy as jp
import numpy as np
import pytest

from helpers import make_toy_env
from track_mjx_tpu.agent import acting
from track_mjx_tpu.agent import wandb_logging


@pytest.fixture(scope="module")
def toy_env():
    return make_toy_env()


class TestEvalAccumulation:
    def test_eval_metrics_survive_nan_step(self, toy_env):
        """A physics NaN mid-episode must not poison eval/episode_* sums."""
        env = acting.EvalWrapper(toy_env)
        state = jax.jit(env.reset)(jax.random.PRNGKey(0))
        # one clean step so steps-bookkeeping info exists
        state.info.setdefault("steps", jp.zeros_like(state.reward))
        state = jax.jit(env.step)(state, jp.zeros(toy_env.action_size))
        # inject a NaN into the pipeline state: the env forces done and
        # sanitizes reward/obs, but term metrics of this step are NaN
        bad = state.replace(
            pipeline_state=state.pipeline_state.replace(
                qvel=state.pipeline_state.qvel.at[0].set(jp.nan)
            )
        )
        nstate = jax.jit(env.step)(bad, jp.zeros(toy_env.action_size))
        em = nstate.info["eval_metrics"].episode_metrics
        for name, value in em.items():
            assert np.isfinite(np.asarray(value)).all(), f"{name} not finite"
        # the event itself is still recorded
        assert float(em["nan"]) >= 1.0
        assert float(nstate.done) == 1.0

    def test_eval_metrics_unchanged_on_clean_steps(self, toy_env):
        """Sanitization must be a no-op for finite metrics."""
        env = acting.EvalWrapper(toy_env)
        state = jax.jit(env.reset)(jax.random.PRNGKey(1))
        state.info.setdefault("steps", jp.zeros_like(state.reward))
        s1 = jax.jit(env.step)(state, jp.zeros(toy_env.action_size))
        em = s1.info["eval_metrics"].episode_metrics
        # accumulated value after one active step == that step's metric
        for name, value in em.items():
            if name == "reward":
                assert float(value) == pytest.approx(float(s1.reward))
            else:
                assert float(value) == pytest.approx(float(s1.metrics[name]))


class TestLatentStatsMasking:
    def _collect_logs(self, monkeypatch, trace):
        logged = {}
        monkeypatch.setattr(
            wandb_logging.wandb,
            "log",
            lambda d, commit=False: logged.update(d),
            raising=False,
        )
        wandb_logging.log_latent_statistics(trace)
        return logged

    def test_nonfinite_frames_masked(self, monkeypatch):
        t, d = 10, 4
        means = jp.ones((t, d))
        logvars = jp.zeros((t, d))
        # frames 6.. blow up (the post-done tail of a crashed rollout)
        means = means.at[6:].set(jp.nan)
        logvars = logvars.at[6:].set(jp.inf)
        trace = wandb_logging.RolloutTrace([], means, logvars)
        logged = self._collect_logs(monkeypatch, trace)
        assert logged["latents/nonfinite_frames"] == 4.0
        for k, v in logged.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        assert float(logged["latents/latent_means_mean0"]) == pytest.approx(1.0)
        assert float(logged["latents/latent_means_std0"]) == pytest.approx(0.0)

    def test_all_finite_matches_plain_stats(self, monkeypatch):
        key = jax.random.PRNGKey(0)
        means = jax.random.normal(key, (8, 3))
        logvars = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        trace = wandb_logging.RolloutTrace([], means, logvars)
        logged = self._collect_logs(monkeypatch, trace)
        assert logged["latents/nonfinite_frames"] == 0.0
        np.testing.assert_allclose(
            [logged[f"latents/latent_means_mean{i}"] for i in range(3)],
            np.mean(np.asarray(means), axis=0),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            [logged[f"latents/latent_logvars_std{i}"] for i in range(3)],
            np.std(np.asarray(logvars), axis=0),
            rtol=1e-5,
        )

    def test_float_max_obs_overflow_chain(self):
        """Documents the mechanism: float-max observations (what nan_to_num
        leaves behind for inf) overflow inside the intention MLP and produce
        non-finite latents — this is why masking is needed, and why the env's
        obs sanitization alone cannot keep the logging path finite."""
        from track_mjx_tpu.agent import running_statistics
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks

        obs_size, ref_size, act_size = 24, 16, 4
        net = ppo_networks.make_intention_ppo_networks(
            observation_size=obs_size,
            reference_obs_size=ref_size,
            action_size=act_size,
            preprocess_observations_fn=running_statistics.normalize,
            intention_latent_size=3,
            encoder_hidden_layer_sizes=(16,),
            decoder_hidden_layer_sizes=(16,),
            value_hidden_layer_sizes=(16,),
        )
        params = net.policy_network.init(jax.random.PRNGKey(0))
        norm = running_statistics.init_state(
            jax.ShapeDtypeStruct((obs_size,), jp.float32)
        )
        policy = ppo_networks.make_inference_fn(net)((norm, params))
        bad_obs = jp.full((obs_size,), jp.finfo(jp.float32).max)
        _, extras = policy(bad_obs, jax.random.PRNGKey(1))
        assert not np.isfinite(np.asarray(extras["latent_mean"])).all()
