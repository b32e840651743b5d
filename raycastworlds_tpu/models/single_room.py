"""SingleRoom: the reference's (only) game.

A walled rectangular room with one goal tile and a circular player
(/root/reference/src/single_room.jl:21-137).  Reset semantics follow
``RCW.reset!`` (:110-137): fresh goal uniform over the interior, player spawn
uniform over empty tiles, heading uniform over angle units, rays cast — all
from a per-env PRNG key split in a fixed documented order
(goal, spawn, heading), replacing the reference's shared-RNG draw order
(:118-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from ..ops import sampling
from ..state import EnvState
from .base import Game


class SingleRoom(Game):
    supports_analytic_raycast = True

    def reset_single(self, key: jax.Array) -> EnvState:
        cfg = self.cfg
        next_key, k_goal, k_spawn, k_dir = jax.random.split(key, 4)

        wall_words = jnp.asarray(cfg.border_wall_words)
        goal_tu = sampling.sample_interior_tile(k_goal, cfg.H, cfg.W)
        # Spawn: uniform over empty tiles = interior minus the goal.  For the
        # border-walls-only map the k-th empty tile is closed-form (interior
        # tiles in row-major order), so the general masked sampler's
        # per-reset [H*W] mask/prefix work disappears.  Bit-identical to
        # sampling.sample_empty_tile over (walls | goal): same uniform draw,
        # same count n, same rank->tile order.
        wi = cfg.W - 2
        n = jnp.float32((cfg.H - 2) * wi - 1)  # interior minus goal
        u = jax.random.uniform(k_spawn, (), dtype=jnp.float32)
        k = jnp.clip(jnp.floor(u * n), 0.0, jnp.maximum(n - 1.0, 0.0)).astype(
            jnp.int32
        )
        goal_rank = (goal_tu[0] - 1) * wi + (goal_tu[1] - 1)
        r = k + (k >= goal_rank).astype(jnp.int32)
        spawn_tu = jnp.stack([1 + r // wi, 1 + r % wi]).astype(jnp.int32)
        pos_wu = spawn_tu.astype(cfg.float_dtype) + 0.5  # tile center (ref :125)
        dir_au = sampling.sample_heading(
            k_dir, cfg.num_directions, cfg.continuous_heading
        )

        zero = jnp.float32(0)
        return EnvState(
            wall_words=wall_words,
            hw=(cfg.H, cfg.W),
            goal_tu=goal_tu,
            pos_wu=pos_wu,
            dir_au=dir_au,
            reward=zero,
            done=jnp.asarray(False),
            rng_key=next_key,
            t=jnp.int32(0),
            episode_return=zero,
            pending_reset=jnp.asarray(False),
        )


def make(cfg: EnvConfig | None = None, **kw) -> SingleRoom:
    return SingleRoom(cfg if cfg is not None else EnvConfig(**kw))
