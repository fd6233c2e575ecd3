"""Attribute device time by trainer phase from a jax.profiler trace.

Consumes the xplane.pb written by `bench.py --profile-dir DIR` (which scopes
the capture to exactly one post-compile training-epoch device call) and
prints device self-time bucketed by the trainer's named scopes
(rollout / sgd / normalizer_update) and by HLO op type within each.

Usage: python tools/trace_phases.py /tmp/jax_trace
"""

from __future__ import annotations

import collections
import glob
import json
import sys


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [
        {
            cid: cell.get("v") if isinstance(cell, dict) else cell
            for cid, cell in zip(cols, r["c"])
        }
        for r in tbl["rows"]
    ]
    dev = [r for r in rows if r["host_or_device"] == "Device"]

    agg = collections.Counter()
    typeagg = collections.Counter()
    for r in dev:
        op, t = r["operation"], r["total_self_time"]
        if "/rollout/" in op:
            b = "rollout"
        elif "/sgd/" in op:
            b = "sgd"
        elif "/normalizer_update/" in op:
            b = "normalizer_update"
        elif op.startswith("IDLE"):
            b = "IDLE"
        else:
            b = "other"
        agg[b] += t
        typeagg[(b, r["type"])] += t

    tot = sum(agg.values())
    print(f"device self time: {tot / 1e6:.2f}s across {len(dev)} op rows")
    for k, v in agg.most_common():
        print(f"  {v / 1e6:8.3f}s {100 * v / tot:5.1f}%  {k}")

    # secondary breakdown: physics stage scopes inside rollout (named scopes
    # added in physics/forward.py), plus the policy forward and the residual
    # env-level obs/reward assembly
    STAGES = (
        "kinematics", "tendon", "crb", "collide", "make_constraint",
        "com_vel", "passive", "rne", "actuation", "solve", "sensor",
        "integrate",
    )
    stage_agg = collections.Counter()
    stage_type = collections.Counter()
    roll_tot = 0
    for r in dev:
        op, t = r["operation"], r["total_self_time"]
        if "/rollout/" not in op:
            continue
        roll_tot += t
        for s in STAGES:
            if f"/{s}/" in op:
                stage_agg[s] += t
                stage_type[(s, r["type"])] += t
                break
        else:
            if "IntentionPolicy" in op or "Value" in op.replace("value", "Value"):
                stage_agg["policy_fwd"] += t
                stage_type[("policy_fwd", r["type"])] += t
            else:
                stage_agg["env_other"] += t
                stage_type[("env_other", r["type"])] += t
    if stage_agg:
        print(f"\nrollout breakdown by physics stage ({roll_tot / 1e6:.2f}s):")
        for k, v in stage_agg.most_common():
            print(f"  {v / 1e6:8.3f}s {100 * v / max(roll_tot, 1):5.1f}%  {k}")
        print("\ntop (stage, op type):")
        for (b, ty), v in sorted(stage_type.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {v / 1e6:8.3f}s  {b:18s} {ty}")
    print("\ntop (phase, op type):")
    for (b, ty), v in sorted(typeagg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v / 1e6:8.3f}s  {b:18s} {ty}")

    # individual op rows: the scope path after the phase marker names the
    # traced source region (jax named_scope / primitive), which is what
    # actually localizes a hot dot_general/gather to a line of physics
    print("\ntop 30 individual ops:")
    for r in sorted(dev, key=lambda r: -r["total_self_time"])[:30]:
        t = r["total_self_time"]
        if r["operation"].startswith("IDLE"):
            continue
        op = r["operation"]
        op = op if len(op) <= 140 else "…" + op[-139:]
        print(f"  {t / 1e6:8.3f}s  {r['type']:15s} {op}")


if __name__ == "__main__":
    main()
