"""Circle-vs-AABB collision detection, branch-free.

Reference: /root/reference/src/collision_detection.jl:1-42.  The reference
scans the 3x3 tile neighborhood of the player's tile with an early-out; here
that becomes a fixed 9-tile gather + vectorized circle/unit-square test with a
reduction — no data-dependent control flow, so it fuses into the jitted step.

Geometry (0-indexed): tile ``(i, j)`` is the unit AABB centered at
``(i+0.5, j+0.5)``.  The player circle of radius ``r`` collides with the tile
iff the squared distance from the circle center to its clamp-projection onto
the AABB is ``< r^2`` (strict, matching collision_detection.jl:14-19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .units import wu_to_tu

# Static 3x3 neighborhood offsets (reference collision_detection.jl:30-31).
_OFFS = np.stack(
    np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), axis=-1
).reshape(9, 2)


def is_colliding_tile(pos_wu: jax.Array, tile_tu: jax.Array, radius) -> jax.Array:
    """Circle at ``pos_wu`` (f32[..., 2]) vs unit AABB at tile ``tile_tu``
    (i32[..., 2]).  Ref: is_colliding, collision_detection.jl:14-19."""
    center = tile_tu.astype(pos_wu.dtype) + jnp.asarray(0.5, pos_wu.dtype)
    rel = pos_wu - center
    proj = jnp.clip(rel, -0.5, 0.5)  # get_projection, collision_detection.jl:9-12
    d2 = jnp.sum((rel - proj) ** 2, axis=-1)
    return d2 < jnp.asarray(radius, pos_wu.dtype) ** 2


def is_player_colliding(
    obstacle_map: jax.Array, pos_wu: jax.Array, radius
) -> jax.Array:
    """True iff the player circle overlaps any occupied tile in the 3x3
    neighborhood of its tile.  Unbatched (vmap for batches).

    Ref: is_player_colliding, collision_detection.jl:21-42.  The reference does
    no bounds check (border walls keep the player >= 1 tile from the edge); we
    clamp gather indices, which is equivalent under that invariant.
    """
    tile = wu_to_tu(pos_wu)  # i32[2]
    neigh = tile[None, :] + jnp.asarray(_OFFS, jnp.int32)  # [9, 2]
    h, w = obstacle_map.shape
    ni = jnp.clip(neigh[:, 0], 0, h - 1)
    nj = jnp.clip(neigh[:, 1], 0, w - 1)
    occupied = obstacle_map[ni, nj]  # bool[9]
    hit = is_colliding_tile(pos_wu[None, :], neigh, radius)  # bool[9]
    return jnp.any(occupied & hit)


def is_player_colliding_packed(
    obstacle_words: jax.Array,
    shape,
    pos_wu: jax.Array,
    radius,
) -> jax.Array:
    """Gather-free variant of :func:`is_player_colliding` over a bit-packed
    map (ops/bitmap.py) — the hot-path version used by the jitted step."""
    from . import bitmap

    h, w = shape
    tile = wu_to_tu(pos_wu)  # i32[2]
    neigh = tile[None, :] + jnp.asarray(_OFFS, jnp.int32)  # [9, 2]
    ni = jnp.clip(neigh[:, 0], 0, h - 1)
    nj = jnp.clip(neigh[:, 1], 0, w - 1)
    occupied = bitmap.lookup_bit(obstacle_words, ni * w + nj)  # bool[9]
    hit = is_colliding_tile(pos_wu[None, :], neigh, radius)  # bool[9]
    return jnp.any(occupied & hit)


def colliding_occupied_words(
    occupied_words: jax.Array,
    shape,
    pos_wu: jax.Array,
    radius,
) -> jax.Array:
    """Packed-words mask of the occupied tiles the player circle overlaps.

    Same 3x3 neighborhood scan as :func:`is_player_colliding_packed`, but
    instead of reducing to a single bool it returns a uint32[n_words] bitmask
    of the colliding occupied tiles — consumers can clear exactly those bits
    (MultiGoalRoom collects every goal the circle touches in one step) or
    popcount them.  No reference equivalent (the reference's collision scan
    early-outs on the first hit, collision_detection.jl:30-39).
    """
    from . import bitmap

    h, w = shape
    nw = occupied_words.shape[-1]
    tile = wu_to_tu(pos_wu)  # i32[2]
    neigh = tile[None, :] + jnp.asarray(_OFFS, jnp.int32)  # [9, 2]
    ni = jnp.clip(neigh[:, 0], 0, h - 1)
    nj = jnp.clip(neigh[:, 1], 0, w - 1)
    idx = ni * w + nj  # i32[9]
    occupied = bitmap.lookup_bit(occupied_words, idx)
    hit = is_colliding_tile(pos_wu[None, :], neigh, radius)
    active = occupied & hit  # bool[9]
    # Scatter the 9 hit bits back into word lanes arithmetically (no gather).
    word_sel = idx[:, None] >> 5 == jnp.arange(nw, dtype=jnp.int32)[None, :]
    bit = jnp.uint32(1) << (idx & 31).astype(jnp.uint32)
    contrib = jnp.where(
        word_sel & active[:, None], bit[:, None], jnp.uint32(0)
    )  # [9, nw]
    # The 3x3 neighborhood tiles are distinct, so OR == sum; use bitwise OR
    # via reduce for clarity.
    return jax.lax.reduce(
        contrib, jnp.uint32(0), jax.lax.bitwise_or, dimensions=(0,)
    )


def is_colliding_with_goal(
    pos_wu: jax.Array, goal_tu: jax.Array, radius
) -> jax.Array:
    """Specialized goal test: the goal occupies exactly one tile, so the 3x3
    map scan the reference does over the GOAL channel
    (/root/reference/src/single_room.jl:162) reduces to a single circle/AABB
    test — any tile farther than the 3x3 neighborhood cannot collide since
    radius < 0.5."""
    return is_colliding_tile(pos_wu, goal_tu, radius)
