"""MultiPlayerRoom walkthrough: P players, per-player sprite cameras, one
shared goal — writes per-player camera frames and the bird's-eye view as
PNGs, then rolls a shared-policy random episode and reports per-player
rewards.

    python examples/multi_player_demo.py --out /tmp/mp_demo
    python examples/multi_player_demo.py --players 3 --steps 200

No display needed; frames are plain PNGs (utils/viewer.png_bytes).  Prints
one JSON line at the end (bench/demo contract).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--players", type=int, default=2)
    p.add_argument("--num-envs", type=int, default=4)
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--num-rays", type=int, default=96)
    p.add_argument("--height-px", type=int, default=96)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="/tmp/multi_player_demo")
    p.add_argument("--render", type=str, default="sprite",
                   choices=["sprite", "block"])
    p.add_argument("--backend", type=str, default="")
    args = p.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import jax.numpy as jnp

    import raycastworlds_tpu as rcw
    from raycastworlds_tpu.utils.viewer import save_png

    cfg = rcw.MultiPlayerConfig(
        num_players=args.players,
        num_rays=args.num_rays,
        height_camera_view_pu=args.height_px,
        player_render=args.render,
    )
    env = rcw.Env(rcw.MultiPlayerRoom(cfg), num_envs=args.num_envs)
    state, obs = env.reset(jax.random.PRNGKey(args.seed))

    os.makedirs(args.out, exist_ok=True)
    cams = np.asarray(env.camera_view(state)[0])        # [P, H, R] u32
    for k in range(args.players):
        save_png(os.path.join(args.out, f"player{k}_camera.png"), cams[k])
    save_png(
        os.path.join(args.out, "top_view.png"),
        np.asarray(env.top_view(state)[0]),
    )

    key = jax.random.PRNGKey(args.seed + 1)
    per_player = np.zeros(args.players, np.float64)
    episodes = 0
    for t in range(args.steps):
        key, k_act = jax.random.split(key)
        res = env.step(state, env.sample_action(k_act))
        state = res.state
        per_player += np.asarray(res.reward).sum(axis=0)
        episodes += int(np.asarray(res.done).sum())
    print(json.dumps({
        "players": args.players,
        "num_envs": args.num_envs,
        "steps": args.steps,
        "per_player_return": [round(float(x), 3) for x in per_player],
        "episodes_finished": episodes,
        "frames_dir": args.out,
        "render": args.render,
    }))


if __name__ == "__main__":
    main()
