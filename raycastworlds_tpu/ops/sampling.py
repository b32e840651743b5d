"""On-device random sampling.

The reference rejection-samples empty tiles with a host loop of up to
``1024*H*W`` tries (/root/reference/src/utils.jl:23-58).  Rejection sampling a
uniform proposal until empty is *exactly* the uniform distribution over empty
tiles, so the TPU-native equivalent is a single masked categorical draw — no
loop, no possibility of exhaustion, identical distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_empty_tile(key: jax.Array, occupied_map: jax.Array) -> jax.Array:
    """Uniform draw over unoccupied tiles of bool[H, W]; returns i32[2].

    Equivalent in distribution to ``sample_empty_position``
    (/root/reference/src/utils.jl:23-58) over the full grid.  If every tile is
    occupied the draw degenerates to uniform over all tiles (the reference
    warns and returns an occupied tile in that case, utils.jl:34-36).
    """
    h, w = occupied_map.shape
    occ = occupied_map.reshape(-1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    logits = jnp.where(occ, neg, 0.0)
    # All-occupied fallback: uniform over everything rather than NaN.
    logits = jnp.where(jnp.all(occ), jnp.zeros_like(logits), logits)
    idx = jax.random.categorical(key, logits)
    return jnp.stack([idx // w, idx % w]).astype(jnp.int32)


def sample_interior_tile(key: jax.Array, h: int, w: int) -> jax.Array:
    """Uniform tile in the interior ``[1, H-1) x [1, W-1)`` — the goal draw
    (/root/reference/src/single_room.jl:120: i then j, uniform over
    ``2:H-1 x 2:W-1`` 1-indexed)."""
    return jax.random.randint(
        key,
        (2,),
        jnp.array([1, 1]),
        jnp.array([h - 1, w - 1]),
        dtype=jnp.int32,
    )


def sample_heading(key: jax.Array, num_directions: int) -> jax.Array:
    """Uniform heading in ``[0, num_directions)``
    (/root/reference/src/single_room.jl:128)."""
    return jax.random.randint(key, (), 0, num_directions, dtype=jnp.int32)
