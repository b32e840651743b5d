"""Train a PPO agent on batched raycast worlds — BASELINE config 5 shape.

Single process, any number of local devices:
    python examples/train_ppo.py --num-envs 1024 --updates 200
Multi-host: call parallel.mesh.initialize_distributed() per host first.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--game",
                   choices=["single_room", "random_room", "maze",
                            "multi_player", "locked_room"],
                   default="single_room")
    p.add_argument("--num-players", type=int, default=2,
                   help="players per env (multi_player; one shared policy)")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--map-h", type=int, default=0, help="tile-map height override")
    p.add_argument("--map-w", type=int, default=0, help="tile-map width override")
    p.add_argument("--updates", type=int, default=100)
    p.add_argument("--rollout-steps", type=int, default=64)
    p.add_argument("--num-rays", type=int, default=32)
    p.add_argument("--height-px", type=int, default=32)
    p.add_argument("--obs", type=str, default="camera_gray")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=0,
                   help="override PPO epochs (0 = PPOConfig default)")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-episode-steps", type=int, default=0)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--trunk", type=str, default="conv",
                   choices=["conv", "patch", "mlp"])
    p.add_argument("--recurrent", action="store_true",
                   help="GRU actor-critic (parallel/ppo_rnn.py) for "
                        "partially observable worlds")
    p.add_argument("--mesh", action="store_true",
                   help="shard over all local devices (dp)")
    p.add_argument("--backend", type=str, default="")
    args = p.parse_args()

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import raycastworlds_tpu as rcw
    from raycastworlds_tpu.parallel import mesh as mesh_lib
    from raycastworlds_tpu.parallel.ppo import PPOConfig, PPOTrainer

    kw = dict(num_rays=args.num_rays, height_camera_view_pu=args.height_px,
              obs_type=args.obs, max_episode_steps=args.max_episode_steps)
    if args.map_h:
        kw["height_tile_map_tu"] = args.map_h
    if args.map_w:
        kw["width_tile_map_tu"] = args.map_w
    if args.game == "single_room":
        game = rcw.SingleRoom(rcw.EnvConfig(**kw))
    elif args.game == "random_room":
        game = rcw.RandomRoom(rcw.RandomRoomConfig(
            height_tile_map_tu=16, width_tile_map_tu=16, **kw))
    elif args.game == "multi_player":
        game = rcw.MultiPlayerRoom(rcw.MultiPlayerConfig(
            num_players=args.num_players, **kw))
    elif args.game == "locked_room":
        game = rcw.LockedRoom(rcw.LockedRoomConfig(**kw))
    else:
        game = rcw.Maze(rcw.MazeConfig(**kw))

    env = rcw.Env(game, num_envs=args.num_envs, jit=False)
    ppo_cfg = PPOConfig(rollout_steps=args.rollout_steps, lr=args.lr)
    if args.epochs:
        ppo_cfg = ppo_cfg._replace(num_epochs=args.epochs)
    dtype = (jax.numpy.bfloat16 if args.dtype == "bfloat16"
             else jax.numpy.float32)
    if args.recurrent:
        from raycastworlds_tpu.parallel.ppo_rnn import RecurrentPPOTrainer

        trainer = RecurrentPPOTrainer(
            env,
            ppo_cfg,
            hidden=args.hidden,
            dtype=dtype,
            trunk=args.trunk,
            mesh=mesh_lib.make_mesh() if args.mesh else None,
        )
    else:
        mesh = mesh_lib.make_mesh() if args.mesh else None
        trainer = PPOTrainer(
            env,
            ppo_cfg,
            mesh=mesh,
            hidden=args.hidden,
            dtype=dtype,
            trunk=args.trunk,
        )
    ts, history = trainer.train(
        jax.random.PRNGKey(args.seed), args.updates, log_every=10
    )
    for h in history:
        print(json.dumps(h))


if __name__ == "__main__":
    main()
