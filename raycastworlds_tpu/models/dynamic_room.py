"""DynamicRoom: SingleRoom plus K moving obstacle blocks.

No reference equivalent — the reference's world is fully static between
resets (/root/reference/src/single_room.jl:110-191).  Blocks are unit tiles
that patrol in a cardinal direction, advancing one tile every
``block_period`` steps and bouncing (direction reversal) off walls, the
goal, other blocks' current tiles, and the player.  They act as walls for
player collision and as obstacles for the raycaster, and render in their own
blue two-shade pair (colors.BLOCK_DIM_I/J).

The block update is branch-free and O(K) with K static: candidate tiles are
tested against the packed wall words plus arithmetic one-hot masks — no
gathers, no data-dependent shapes — so the whole update fuses into the
jitted step.

State encoding: ``EnvState.blocks`` int32[K, 3] rows (i_tu, j_tu, dir) with
dir in 0..3 over (N, S, W, E) = ((-1,0),(1,0),(0,-1),(0,1)); reversal is
``dir ^ 1``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..ops import bitmap, collision, sampling
from ..state import EnvState
from .base import Game

_CARDINAL = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], np.int32)


@dataclasses.dataclass(frozen=True)
class DynamicRoomConfig(EnvConfig):
    num_blocks: int = 3
    block_period: int = 4  # blocks advance one tile every this many steps

    def __post_init__(self):
        super().__post_init__()
        interior = (self.height_tile_map_tu - 2) * (self.width_tile_map_tu - 2)
        if not (1 <= self.num_blocks < interior - 1):
            raise ValueError("num_blocks out of range for this map size")
        if self.block_period < 1:
            raise ValueError("block_period must be >= 1")


def _blocks_to_words(blocks: jax.Array, shape, nw: int) -> jax.Array:
    """Pack block tiles into words arithmetically (K one-hot ORs)."""
    return bitmap.tiles_to_words(blocks, shape, nw)


class DynamicRoom(Game):
    supports_analytic_raycast = True  # border ring + K blocks + 1 goal box

    def _analytic_boxes(self, state: EnvState):
        return jnp.concatenate(
            [state.blocks[:, :2], state.goal_tu[None, :]], axis=0
        )

    def __init__(self, cfg: DynamicRoomConfig):
        if not isinstance(cfg, DynamicRoomConfig):
            raise TypeError("DynamicRoom requires a DynamicRoomConfig")
        super().__init__(cfg)

    def reset_single(self, key: jax.Array) -> EnvState:
        cfg: DynamicRoomConfig = self.cfg
        h, w = cfg.H, cfg.W
        next_key, k_goal, k_blocks, k_dirs, k_spawn, k_dir = jax.random.split(
            key, 6
        )

        wall_words = jnp.asarray(cfg.border_wall_words)
        goal_tu = sampling.sample_interior_tile(k_goal, h, w)

        # Blocks and spawn via the closed-form interior sampler (bit-identical
        # to the old dense masked draws over walls|goal|previous-blocks; see
        # models/multi_goal.py for why this matters under dense auto-reset).
        ranks = [sampling.interior_rank(goal_tu, w)]
        bkeys = jax.random.split(k_blocks, cfg.num_blocks)
        tiles = []
        for k in range(cfg.num_blocks):
            b = sampling.sample_empty_interior_tile(
                bkeys[k], h, w, jnp.stack(ranks)
            )
            ranks.append(sampling.interior_rank(b, w))
            tiles.append(b)
        dirs = jax.random.randint(
            k_dirs, (cfg.num_blocks,), 0, 4, dtype=jnp.int32
        )
        blocks = jnp.concatenate(
            [jnp.stack(tiles), dirs[:, None]], axis=1
        )  # [K, 3]

        spawn_tu = sampling.sample_empty_interior_tile(
            k_spawn, h, w, jnp.stack(ranks)
        )
        pos_wu = spawn_tu.astype(cfg.float_dtype) + 0.5
        dir_au = sampling.sample_heading(
            k_dir, cfg.num_directions, cfg.continuous_heading
        )

        zero = jnp.float32(0)
        return EnvState(
            wall_words=wall_words,
            hw=(h, w),
            goal_tu=goal_tu,
            blocks=blocks,
            pos_wu=pos_wu,
            dir_au=dir_au,
            reward=zero,
            done=jnp.asarray(False),
            rng_key=next_key,
            t=jnp.int32(0),
            episode_return=zero,
            pending_reset=jnp.asarray(False),
        )

    # -- block dynamics ---------------------------------------------------

    def _block_words(self, state: EnvState):
        cfg = self.cfg
        nw = state.wall_words.shape[-1]
        return _blocks_to_words(state.blocks, (cfg.H, cfg.W), nw)

    def _advance_blocks(self, state: EnvState) -> jax.Array:
        """One block tick: advance or bounce.  Pure function of state."""
        cfg: DynamicRoomConfig = self.cfg
        h, w = cfg.H, cfg.W
        blocks = state.blocks
        card = jnp.asarray(_CARDINAL)
        step = card[blocks[:, 2]]  # [K, 2] (static-K gather over 4 rows)
        cand = blocks[:, :2] + step

        idx = jnp.clip(cand[:, 0], 0, h - 1) * w + jnp.clip(cand[:, 1], 0, w - 1)
        into_wall = bitmap.lookup_bit(state.wall_words, idx)
        into_goal = jnp.all(cand == state.goal_tu[None, :], axis=1)
        # other blocks' CURRENT tiles (blocks move simultaneously; a block may
        # move into a tile another block vacates only on the next tick)
        same = jnp.all(
            cand[:, None, :] == blocks[None, :, :2], axis=-1
        )  # [K, K]
        into_block = jnp.any(same, axis=1)
        # don't run the player over: candidate tile must not overlap the
        # player circle
        into_player = collision.is_colliding_tile(
            state.pos_wu[None, :], cand, cfg.player_radius_wu
        )
        blocked = into_wall | into_goal | into_block | into_player

        new_tile = jnp.where(blocked[:, None], blocks[:, :2], cand)
        new_dir = jnp.where(blocked, blocks[:, 2] ^ 1, blocks[:, 2])
        return jnp.concatenate([new_tile, new_dir[:, None]], axis=1)

    # -- step ---------------------------------------------------------------

    def step_single(self, state: EnvState, action: jax.Array) -> EnvState:
        cfg: DynamicRoomConfig = self.cfg
        # Blocks tick first (on steps where t+1 is a multiple of the period),
        # then the player acts against the post-tick obstacle field.
        tick = jnp.mod(state.t + 1, cfg.block_period) == 0
        advanced = self._advance_blocks(state)
        new_blocks = jnp.where(tick, advanced, state.blocks)
        state = state.replace(blocks=new_blocks)

        moving, cand = self._move_candidate(state, action)
        r = cfg.player_radius_wu
        shape = (cfg.H, cfg.W)
        hit_goal = moving & collision.is_colliding_with_goal(
            cand, state.goal_tu, r
        )
        solid = state.wall_words | self._block_words(state)
        hit_wall = moving & collision.is_player_colliding_packed(
            solid, shape, cand, r
        )

        dtype = state.pos_wu.dtype
        reward = jnp.where(
            hit_goal, jnp.asarray(cfg.goal_reward, dtype), jnp.asarray(0, dtype)
        )
        done = hit_goal
        new_pos = jnp.where(moving & ~hit_goal & ~hit_wall, cand, state.pos_wu)
        new_dir = self._turned_dir(state, action, moving)

        return state.replace(
            pos_wu=new_pos,
            dir_au=new_dir,
            reward=reward,
            done=done,
            t=state.t + 1,
            episode_return=state.episode_return + reward,
        )

    # Raycaster obstacle union: walls OR goal OR blocks.

    def _packed_maps(self, state: EnvState):
        walls, obstacle = super()._packed_maps(state)
        return walls, obstacle | self._block_words(state)

    def _packed_maps_batch(self, state: EnvState):
        walls, obstacle = super()._packed_maps_batch(state)
        return walls, obstacle | self._block_words_batch(state)

    def _block_words_batch(self, state: EnvState):
        return jax.vmap(
            lambda b: _blocks_to_words(
                b, (self.cfg.H, self.cfg.W), state.wall_words.shape[-1]
            )
        )(state.blocks)


def make(cfg: DynamicRoomConfig | None = None, **kw) -> DynamicRoom:
    return DynamicRoom(cfg if cfg is not None else DynamicRoomConfig(**kw))
