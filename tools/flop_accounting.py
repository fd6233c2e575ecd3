"""Compiler-derived FLOP/byte accounting for the rollout hot path (VERDICT
r2 "What's weak" #2: perf accounting stopped at sps — no FLOP/MFU analysis).

Lowers the SAME jitted programs bench.py times (the batched physics step,
the full rollout step incl. obs/reward and policy forward) and reads XLA's
`compiled.cost_analysis()` — the compiler's own FLOP and HBM-byte counts —
then converts a measured sps figure into achieved FLOPS/bandwidth and
utilization against the device peaks. Run on the TPU host:

    python tools/flop_accounting.py [--num-envs 4096] [--sps 23184]

Peaks (TPU v5e / v5 lite, per chip): 197 TFLOPS bf16, ~98.5 TFLOPS f32
(MXU), 819 GB/s HBM. The physics pipeline is f32 by design (solver
numerics); the policy forward is f32 or bf16 (bench --bf16).

Output: a JSON block to stdout (paste into BASELINE.md's ceiling section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12
V5E_HBM_BYTES_S = 819e9


def _cost(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):  # older jax returns one dict per computation
        c = c[0]
    return {
        "flops": float(c.get("flops", -1)),
        "bytes": float(c.get("bytes accessed", -1)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--num-clips", type=int, default=4)
    ap.add_argument("--walker", choices=("rodent", "fly"), default="rodent")
    ap.add_argument(
        "--sps",
        type=float,
        default=None,
        help="measured training or rollout env-steps/s to convert into "
        "achieved FLOPS / bandwidth (e.g. the BENCH figure)",
    )
    args = ap.parse_args()

    from bench import build_env
    from track_mjx_tpu.envs import wrappers
    from track_mjx_tpu.physics import forward as pf

    env, cfg = build_env(args.num_clips, walker_type=args.walker)
    n_sub = env._n_frames

    # --- batched physics substep (the rollout's inner loop) ---------------
    from track_mjx_tpu.physics import model as phys_model

    plan, model = env.plan, env.model
    data0 = jax.vmap(lambda _: phys_model.make_data(plan, model))(
        jnp.arange(args.num_envs)
    )

    def physics_step(data):
        return jax.vmap(lambda d: pf.forward(plan, model, d))(data)

    phys = _cost(physics_step, data0)

    # --- full env step (physics substeps + obs/reward assembly) -----------
    wrapped = wrappers.wrap(
        env, episode_length=200, action_repeat=1, use_lstm=False
    )
    keys = jax.random.split(jax.random.PRNGKey(0), args.num_envs)
    state0 = jax.jit(wrapped.reset)(keys)
    act0 = jnp.zeros((args.num_envs, env.action_size))
    envstep = _cost(wrapped.step, state0, act0)

    per_env_step = {
        "physics_substep_flops": phys["flops"] / args.num_envs,
        "physics_substep_bytes": phys["bytes"] / args.num_envs,
        "physics_control_step_flops": phys["flops"] * n_sub / args.num_envs,
        "env_step_flops": envstep["flops"] / args.num_envs,
        "env_step_bytes": envstep["bytes"] / args.num_envs,
    }

    out = {
        "walker": args.walker,
        "num_envs": args.num_envs,
        "physics_steps_per_control_step": n_sub,
        "compiler_cost_analysis": {"physics_substep": phys, "env_step": envstep},
        "per_env_step": per_env_step,
        "peaks": {
            "bf16_flops": V5E_PEAK_BF16,
            "f32_flops": V5E_PEAK_F32,
            "hbm_bytes_s": V5E_HBM_BYTES_S,
        },
    }
    if args.sps:
        achieved_flops = args.sps * per_env_step["env_step_flops"]
        achieved_bw = args.sps * per_env_step["env_step_bytes"]
        out["at_measured_sps"] = {
            "sps": args.sps,
            "achieved_flops": achieved_flops,
            "mfu_vs_f32_peak": achieved_flops / V5E_PEAK_F32,
            "mfu_vs_bf16_peak": achieved_flops / V5E_PEAK_BF16,
            "achieved_hbm_bytes_s": achieved_bw,
            "hbm_utilization": achieved_bw / V5E_HBM_BYTES_S,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
