"""LockedRoom: a two-stage sparse-reward task — collect the key, then the
goal.

No reference equivalent (the reference's only game is the single-goal
SingleRoom, /root/reference/src/single_room.jl).  The room is split by a
full-height line of DOOR tiles at a fixed interior column; the goal spawns
on the far side, the player and a KEY tile on the near side.  Doors act as
walls (movement and raycast) and render in the blue block pair
(colors.BLOCK_DIM_I/J, the DynamicRoom convention for non-wall solids)
until the key is collected, at which point they vanish for the rest of the
episode.  The key renders in the goal red pair (it is a red collectable the
policy must learn is NOT the terminal goal): contact collects it and blocks
the move for that step — the goal-blocks-entry rule
(/root/reference/src/single_room.jl:165-168) applied to a zero-reward
collectable — after which the path to the real goal is open.

Everything reuses the base Game machinery: doors are a host-precomputed
packed-word constant masked by ``key_held`` (no per-step packing), the key
is one arithmetic one-hot word OR-ed into the raycast obstacle union, and
the step stays fully branch-free.  Scalar mirror:
oracle/families.OracleLockedRoom (doors ride the oracle's block list, the
key its goal-tiles list — same color and obstacle semantics by
construction).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..ops import collision, sampling
from ..state import EnvState
from .base import Game


@dataclasses.dataclass(frozen=True)
class LockedRoomConfig(EnvConfig):
    # Interior column holding the door line; 0 resolves to W // 2.  Must
    # leave at least one interior column on each side.
    door_col: int = 0

    def __post_init__(self):
        super().__post_init__()
        if self.width_tile_map_tu < 5:
            raise ValueError(
                "LockedRoom needs width_tile_map_tu >= 5 (interior on both "
                "sides of the door line)"
            )
        dc = self.resolved_door_col
        if not (2 <= dc <= self.width_tile_map_tu - 3):
            raise ValueError(
                f"door_col {dc} must be in [2, W-3] so both sides keep "
                "interior tiles"
            )

    @property
    def resolved_door_col(self) -> int:
        return self.door_col if self.door_col else self.width_tile_map_tu // 2

    @functools.cached_property
    def door_words(self) -> np.ndarray:
        """Packed occupancy words of the door line (host constant)."""
        from ..ops.bitmap import pack_bits_np

        m = np.zeros((self.H, self.W), dtype=bool)
        m[1 : self.H - 1, self.resolved_door_col] = True
        return pack_bits_np(m)


class LockedRoom(Game):
    def __init__(self, cfg: LockedRoomConfig):
        if not isinstance(cfg, LockedRoomConfig):
            raise TypeError("LockedRoom requires a LockedRoomConfig")
        super().__init__(cfg)

    # -- reset ----------------------------------------------------------
    # RNG draw order (parity-mirrored in OracleLockedRoom.reset):
    #   next_key, k_goal, k_key, k_spawn, k_dir = split(key, 5)
    #   goal  ~ uniform interior right of the door (i then j bounds)
    #   key   ~ uniform interior left of the door
    #   spawn ~ uniform interior left of the door minus the key tile
    #           (closed-form rank draw with one exclusion)
    #   heading ~ sample_heading

    def reset_single(self, key: jax.Array) -> EnvState:
        cfg: LockedRoomConfig = self.cfg
        h, w = cfg.H, cfg.W
        dc = cfg.resolved_door_col
        next_key, k_goal, k_key, k_spawn, k_dir = jax.random.split(key, 5)

        wall_words = jnp.asarray(cfg.border_wall_words)
        goal_tu = jax.random.randint(
            k_goal, (2,),
            jnp.array([1, dc + 1]), jnp.array([h - 1, w - 1]),
            dtype=jnp.int32,
        )
        key_tu = jax.random.randint(
            k_key, (2,),
            jnp.array([1, 1]), jnp.array([h - 1, dc]),
            dtype=jnp.int32,
        )
        # spawn: uniform over the left interior minus the key tile, by the
        # same rank-with-exclusions order statistics as
        # sampling.sample_empty_interior_tile, scoped to the left columns.
        wi = dc - 1                       # left interior width
        n = jnp.float32((h - 2) * wi - 1)
        u = jax.random.uniform(k_spawn, (), dtype=jnp.float32)
        kk = jnp.clip(
            jnp.floor(u * n), 0.0, jnp.maximum(n - 1.0, 0.0)
        ).astype(jnp.int32)
        key_rank = (key_tu[0] - 1) * wi + (key_tu[1] - 1)
        r = kk + (key_rank <= kk).astype(jnp.int32)
        spawn_tu = jnp.stack([1 + r // wi, 1 + r % wi]).astype(jnp.int32)

        pos_wu = spawn_tu.astype(cfg.float_dtype) + 0.5
        dir_au = sampling.sample_heading(
            k_dir, cfg.num_directions, cfg.continuous_heading
        )

        zero = jnp.float32(0)
        return EnvState(
            wall_words=wall_words,
            hw=(h, w),
            goal_tu=goal_tu,
            key_tu=key_tu,
            key_held=jnp.asarray(False),
            pos_wu=pos_wu,
            dir_au=dir_au,
            reward=zero,
            done=jnp.asarray(False),
            rng_key=next_key,
            t=jnp.int32(0),
            episode_return=zero,
            pending_reset=jnp.asarray(False),
        )

    # -- doors / key words ----------------------------------------------

    def _door_words(self, state: EnvState):
        """Packed door occupancy, all-zero once the key is held."""
        words = jnp.asarray(self.cfg.door_words)
        return jnp.where(state.key_held, jnp.uint32(0), words)

    def _key_word(self, state: EnvState):
        """Arithmetic one-hot word of the key tile, zero once held."""
        cfg = self.cfg
        kidx = state.key_tu[0] * cfg.W + state.key_tu[1]
        nw = state.wall_words.shape[-1]
        vec = jnp.where(
            jnp.arange(nw, dtype=jnp.int32) == (kidx >> 5),
            jnp.uint32(1) << (kidx & 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        return jnp.where(state.key_held, jnp.uint32(0), vec)

    # doors render in the blue block pair (and join the obstacle union)
    def _block_words(self, state: EnvState):
        return self._door_words(state)

    def _block_words_batch(self, state: EnvState):
        return jax.vmap(self._door_words)(state)

    # raycast obstacle union: walls | goal | key | doors
    def _packed_maps(self, state: EnvState):
        walls, obstacle = super()._packed_maps(state)
        return walls, obstacle | self._door_words(state) | self._key_word(
            state
        )

    def _packed_maps_batch(self, state: EnvState):
        walls, obstacle = super()._packed_maps_batch(state)
        return walls, obstacle | jax.vmap(self._door_words)(
            state
        ) | jax.vmap(self._key_word)(state)

    # -- step ------------------------------------------------------------

    def step_single(self, state: EnvState, action: jax.Array) -> EnvState:
        cfg: LockedRoomConfig = self.cfg
        dtype = state.pos_wu.dtype
        moving, cand = self._move_candidate(state, action)
        r = cfg.player_radius_wu

        hit_goal = moving & collision.is_colliding_with_goal(
            cand, state.goal_tu, r
        )
        hit_key = (
            moving
            & ~state.key_held
            & collision.is_colliding_with_goal(cand, state.key_tu, r)
        )
        solid = state.wall_words | self._door_words(state)
        hit_wall = moving & collision.is_player_colliding_packed(
            solid, (cfg.H, cfg.W), cand, r
        )

        reward = jnp.where(
            hit_goal, jnp.asarray(cfg.goal_reward, dtype), jnp.asarray(0, dtype)
        )
        done = hit_goal
        # goal-blocks-entry, and key contact blocks the move the same way
        new_pos = jnp.where(
            moving & ~hit_goal & ~hit_key & ~hit_wall, cand, state.pos_wu
        )
        new_dir = self._turned_dir(state, action, moving)

        return state.replace(
            pos_wu=new_pos,
            dir_au=new_dir,
            key_held=state.key_held | hit_key,
            reward=reward,
            done=done,
            t=state.t + 1,
            episode_return=state.episode_return + reward,
        )


def make(cfg: LockedRoomConfig | None = None, **kw) -> LockedRoom:
    return LockedRoom(cfg if cfg is not None else LockedRoomConfig(**kw))
