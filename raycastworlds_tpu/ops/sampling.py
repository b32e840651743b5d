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
    occupied the draw returns tile 0 (the reference warns and returns an
    occupied tile on exhaustion, utils.jl:34-36).

    Implementation: cumsum inversion — count the empty tiles, draw ONE
    uniform, select the k-th empty tile by argmax over the running count.
    A masked-gumbel categorical would burn H*W random uniforms per env per
    auto-reset; this draws one.  Auto-reset runs this every step for every
    env, so the random-bit budget matters.  (Selection bias from the
    float32 ``u*n`` inversion is < n/2^24 — far below anything observable.)
    The NumPy oracle mirrors this arithmetic exactly.
    """
    h, w = occupied_map.shape
    nt = h * w
    empty = (~occupied_map.reshape(-1)).astype(jnp.float32)
    c = _prefix_count(empty)
    n = c[-1]
    u = jax.random.uniform(key, (), dtype=jnp.float32)
    k = jnp.clip(jnp.floor(u * n), 0.0, jnp.maximum(n - 1.0, 0.0))
    idx = jnp.argmax(c > k).astype(jnp.int32)
    return jnp.stack([idx // w, idx % w]).astype(jnp.int32)


_PREFIX_BLOCK = 256


def _prefix_count(empty: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a 0/1 float32 vector, as MXU matvecs.

    ``jnp.cumsum`` lowers to an O(n^2) reduce-window on TPU (measured ~20%
    of a whole env step), and a single [n, n] ones-triangle matvec — the
    round-1 fix — embeds an O(n^2)-memory constant that dies quietly beyond
    small maps (a 64x64 map would mean a 67 MB triangle inside every reset).
    This is the O(n)-memory version: block the vector into [nb, bs], do the
    within-block inclusive prefix against a [bs, bs] triangle, then add the
    exclusive prefix of the block totals (a second small triangular matvec).
    All intermediate values are integer-valued counts <= n, exact in float32
    (n < 2^24), so the result — and every draw derived from it — is
    bit-identical to both the single-triangle and cumsum formulations.
    """
    import numpy as np

    nt = empty.shape[0]
    if nt <= _PREFIX_BLOCK:
        triu = jnp.asarray(np.triu(np.ones((nt, nt), np.float32)))
        return jnp.dot(empty, triu, preferred_element_type=jnp.float32)
    bs = _PREFIX_BLOCK
    nb = -(-nt // bs)
    pad = nb * bs - nt
    ep = jnp.concatenate([empty, jnp.zeros((pad,), empty.dtype)]) if pad else empty
    blocks = ep.reshape(nb, bs)
    triu = jnp.asarray(np.triu(np.ones((bs, bs), np.float32)))
    within = jnp.dot(blocks, triu, preferred_element_type=jnp.float32)  # [nb, bs]
    totals = within[:, -1]                                              # [nb]
    striu = jnp.asarray(np.triu(np.ones((nb, nb), np.float32), k=1))
    offsets = jnp.dot(totals, striu, preferred_element_type=jnp.float32)
    return (within + offsets[:, None]).reshape(nb * bs)[:nt]


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
