"""Named per-op device-time breakdown of the flagship env step
(VERDICT r4 #3: the ~19 ns/env base-step cost, attributed by trace).

Runs the bench.py flagship program (4096 envs x 64 rays x 64 px, dense
auto-reset, random actions) under ``jax.profiler``, then aggregates the
device-side trace events by op name and prints the top offenders with
per-env-step costs.  The scan body repeats every op ``steps`` times, so
one program execution yields a stable per-op sample.

Usage: python examples/profile_step.py [--num-envs 4096 --steps 64 ...]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def aggregate_trace(log_dir: str):
    """Sum device-side complete events by name from the Perfetto JSON the
    profiler writes (no tensorboard dependency)."""
    paths = sorted(glob.glob(os.path.join(log_dir, "**/*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return agg, cnt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-rays", type=int, default=64)
    p.add_argument("--height-px", type=int, default=64)
    p.add_argument("--obs", type=str, default="camera_u32")
    p.add_argument("--game", type=str, default="single_room")
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--raycast", type=str, default="auto")
    p.add_argument("--reset-budget", type=int, default=0)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace-dir", type=str, default="/tmp/rcw_trace_step")
    args = p.parse_args()

    sys.path.insert(0, os.getcwd())
    from bench import build_env
    from raycastworlds_tpu.parallel.rollout import steps_per_second_program

    env = build_env(
        game=args.game, num_envs=args.num_envs, num_rays=args.num_rays,
        height_px=args.height_px, obs=args.obs, raycast=args.raycast,
        reset_budget=args.reset_budget,
    )
    state, _ = jax.jit(env._reset_impl)(jax.random.PRNGKey(0))
    run = jax.jit(steps_per_second_program(env, args.steps))
    key = jax.random.PRNGKey(1)
    state, acc = run(state, key)
    float(acc)  # compile + settle

    os.system(f"rm -rf {args.trace_dir}")
    jax.profiler.start_trace(args.trace_dir)
    state, acc = run(state, key)
    float(acc)
    jax.profiler.stop_trace()

    agg, cnt = aggregate_trace(args.trace_dir)
    # the outermost jit/while events double-count their children; drop them
    inner = {
        n: us for n, us in agg.items()
        if not (n.startswith("jit_") or n.startswith("while")
                or n in ("0", "1"))
    }
    tot_inner = sum(inner.values())
    denom = args.num_envs * args.steps
    rows = []
    for name, us in sorted(inner.items(), key=lambda kv: -kv[1])[: args.top]:
        rows.append({
            "op": name,
            "ms": round(us / 1e3, 3),
            "calls": cnt[name],
            "ns_per_env_step": round(us * 1e3 / denom, 3),
            "pct": round(100 * us / tot_inner, 1),
        })
    print(json.dumps({
        "config": vars(args),
        "total_inner_ms": round(tot_inner / 1e3, 2),
        "ns_per_env_step_total": round(tot_inner * 1e3 / denom, 2),
        "ops": rows,
    }, indent=1))


if __name__ == "__main__":
    main()
