"""Rollout driver demo: device-resident random rollouts with metrics.

Shows the intended production shape: T-step jitted rollouts, on-device
metric reduction (works under sharding), host-side Meter logging every
chunk, optional profiler trace.

    python examples/rollout_demo.py --num-envs 4096 --chunks 20
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--game", choices=["single_room", "random_room", "maze"],
                   default="single_room")
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--chunk-steps", type=int, default=128)
    p.add_argument("--chunks", type=int, default=10)
    p.add_argument("--num-rays", type=int, default=64)
    p.add_argument("--height-px", type=int, default=64)
    p.add_argument("--trace-dir", type=str, default="")
    p.add_argument("--backend", type=str, default="")
    args = p.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import raycastworlds_tpu as rcw
    from raycastworlds_tpu.parallel.rollout import rollout_random
    from raycastworlds_tpu.utils.profiling import Meter, device_metrics, trace

    kw = dict(num_rays=args.num_rays, height_camera_view_pu=args.height_px)
    if args.game == "single_room":
        game = rcw.SingleRoom(rcw.EnvConfig(**kw))
    elif args.game == "random_room":
        game = rcw.RandomRoom(rcw.RandomRoomConfig(
            height_tile_map_tu=16, width_tile_map_tu=16, **kw))
    else:
        game = rcw.Maze(rcw.MazeConfig(**kw))
    env = rcw.Env(game, num_envs=args.num_envs, jit=False)

    @jax.jit
    def chunk(state, key):
        state, traj = rollout_random(env, state, key, args.chunk_steps)
        return state, device_metrics(traj.done, traj.reward)

    state, _ = jax.jit(env._reset_impl)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # warmup/compile outside the meter
    state, m = chunk(state, key)
    jax.tree_util.tree_map(lambda x: float(x), m)

    meter = Meter()
    ctx = trace(args.trace_dir) if args.trace_dir else None
    if ctx:
        ctx.__enter__()
    for c in range(args.chunks):
        key = jax.random.fold_in(key, c)
        state, m = chunk(state, key)
        meter.update({k: float(v) for k, v in m.items()})
    if ctx:
        ctx.__exit__(None, None, None)

    print(json.dumps(meter.snapshot()))


if __name__ == "__main__":
    main()
