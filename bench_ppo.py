"""End-to-end training throughput: PPO learner in the loop (BASELINE
config 5 shape, single host).

Measures env-steps/s through the FULL train step — on-device rollout with
policy inference per step, GAE, clipped PPO epochs — i.e. what an RL user
actually sustains, not just the env.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax

# Persistent XLA compilation cache: the crossing-backend programs take
# minutes to compile on TPU; caching makes repeat bench invocations (and the
# driver's end-of-round run) near-instant to warm up.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=2048)
    p.add_argument("--rollout-steps", type=int, default=64)
    p.add_argument("--updates", type=int, default=8, help="timed updates")
    p.add_argument("--num-rays", type=int, default=64)
    p.add_argument("--height-px", type=int, default=64)
    p.add_argument("--obs", type=str, default="camera_gray")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="network compute dtype (params stay float32)")
    p.add_argument("--trunk", type=str, default="conv",
                   choices=["conv", "patch"],
                   help="image trunk: overlapping convs or 8x8 patch embed")
    p.add_argument("--game", type=str, default="single_room",
                   choices=["single_room", "multi_player"])
    p.add_argument("--num-players", type=int, default=2,
                   help="players per env (multi_player; one shared policy)")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--backend", type=str, default="")
    args = p.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import raycastworlds_tpu as rcw
    from raycastworlds_tpu.parallel import mesh as mesh_lib
    from raycastworlds_tpu.parallel.ppo import PPOConfig, PPOTrainer

    kw = dict(
        num_rays=args.num_rays,
        height_camera_view_pu=args.height_px,
        obs_type=args.obs,
    )
    if args.game == "multi_player":
        game = rcw.MultiPlayerRoom(
            rcw.MultiPlayerConfig(num_players=args.num_players, **kw)
        )
    else:
        game = rcw.SingleRoom(rcw.EnvConfig(**kw))
    env = rcw.Env(game, num_envs=args.num_envs, jit=False)
    import jax.numpy as jnp

    trainer = PPOTrainer(
        env,
        PPOConfig(rollout_steps=args.rollout_steps),
        mesh=mesh_lib.make_mesh() if args.mesh else None,
        hidden=args.hidden,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        trunk=args.trunk,
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.train_step(ts)  # compile
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.updates):
        ts, metrics = trainer.train_step(ts)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps = args.num_envs * args.rollout_steps * args.updates
    sps = steps / dt
    print(json.dumps({
        "metric": "ppo_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "steps/s (through full PPO train step)",
        "vs_baseline": round(sps / 1e7, 4),
        "config": {
            "game": args.game,
            "num_players": (
                args.num_players if args.game == "multi_player" else 1
            ),
            "num_envs": args.num_envs,
            "rollout_steps": args.rollout_steps,
            "obs": args.obs,
            "hidden": args.hidden,
            "dtype": args.dtype,
            "trunk": args.trunk,
            "device": str(jax.devices()[0]),
            "n_devices": len(jax.devices()) if args.mesh else 1,
        },
        "seconds": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
