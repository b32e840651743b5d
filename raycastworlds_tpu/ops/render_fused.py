"""Fused Pallas TPU kernel: DDA raycast + camera-view compositing.

The production hot path.  The reference computes these as two separate
passes — the DDA march (external RayCaster.jl, contract at
/root/reference/src/single_room.jl:223-227) and the per-column camera
renderer (``update_camera_view!``, /root/reference/src/single_room.jl:374-444).
The round-1 TPU design ran them as a vmapped ``lax.scan`` plus an XLA
compare-select render, which is correct but streams the scan's ~28-byte/ray
carry through HBM every DDA iteration: at 8192 envs x 256 rays that is
~3.8 GB of pure carry traffic per batch-step — the measured wall for the
high-res configs (docs/RESULTS.md).

This kernel fuses the entire pipeline into one Mosaic program per block of
envs:

* the DDA carries ([BLK, R] x 7 arrays) live in VMEM/vector registers for
  the whole march — zero HBM traffic until the final image write;
* the hit -> wall-color lookup, fisheye correction, column height and
  ceiling/wall/floor compositing happen in the same program, so the
  intermediate hit buffers never exist in HBM at all;
* the only HBM write is the finished uint32 image — the irreducible
  observation traffic.

Bit-exactness: the float32 operation sequence matches ``raycast.cast_rays_scan``
followed by ``render.render_camera_u32``, and under the CPU interpret mode the
output is bit-identical to the scan+XLA path.  On TPU hardware Mosaic's FMA
contraction of the fisheye mul-add chain differs from the XLA path's at the
last bit, which can flip floor decisions at knife edges (observed as a
handful of pixels per ~10^9 in rollout checksums) — ulp-level render
differences only; dynamics never flow through this kernel.  The mirror
(ref :431, column
``k = R-1-i``) is implemented by feeding the ray fan already reversed
(``EnvConfig.ray_fan_lut_flipped``) so the kernel writes columns in order.

Masks are 0/1 int32 throughout (not bool vectors): Mosaic mis-lays-out
mixed-rank i1 vectors; integer blends are bit-exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import colors
from ..config import EnvConfig


def _select_word(words_ref, word_idx, shape, n_words, col0: int):
    """Per-lane word select from a [BLK, n_words] u32 block: a static chain
    of multiply-adds (no gather), same arithmetic as ops/bitmap.lookup_bit."""
    occ_word = jnp.zeros(shape, jnp.uint32)
    for k in range(n_words):
        wk = words_ref[:, col0 + k][:, None]  # [BLK, 1] u32
        sel = jnp.where(word_idx == k, jnp.uint32(1), jnp.uint32(0))
        occ_word = occ_word + sel * jnp.broadcast_to(wk, shape)
    return occ_word


def _kernel(
    dx_ref, dy_ref, px_ref, py_ref, pdx_ref, pdy_ref, words_ref,
    img_ref,
    *, h: int, w: int, n_words: int, max_steps: int, hpu: int,
    has_blocks: bool, num_f: float, denom_f: float,
):
    """One env-block: full DDA march + camera compositing.

    words_ref packs [obstacle_words | wall_words | block_words?] along the
    last axis ([BLK, n_words * (2 or 3)]) so the kernel has a single packed
    operand.
    """
    dx = dx_ref[:, :]          # [BLK, R] ray dirs (already mirrored)
    dy = dy_ref[:, :]
    px = px_ref[:, :]          # [BLK, 1]
    py = py_ref[:, :]

    map_i0 = jnp.floor(px).astype(jnp.int32)
    map_j0 = jnp.floor(py).astype(jnp.int32)
    map_i = jnp.broadcast_to(map_i0, dx.shape)
    map_j = jnp.broadcast_to(map_j0, dx.shape)

    delta_i = jnp.abs(1.0 / dx)   # IEEE +inf where dx == 0
    delta_j = jnp.abs(1.0 / dy)
    step_i = jnp.where(dx < 0, -1, 1).astype(jnp.int32)
    step_j = jnp.where(dy < 0, -1, 1).astype(jnp.int32)

    frac_i = px - jnp.floor(px)
    frac_j = py - jnp.floor(py)
    side_i = jnp.where(dx < 0, frac_i, 1.0 - frac_i) * delta_i
    side_j = jnp.where(dy < 0, frac_j, 1.0 - frac_j) * delta_j

    big = jnp.asarray(jnp.finfo(dx.dtype).max, dx.dtype)
    hit = jnp.zeros(dx.shape, jnp.int32)
    hit_dim = jnp.zeros(dx.shape, jnp.int32)
    dist = jnp.full(dx.shape, big, dx.dtype)

    def body(_, carry):
        map_i, map_j, side_i, side_j, hit, hit_dim, dist = carry
        take_i = jnp.where(side_i < side_j, 1, 0).astype(jnp.int32)
        adv = 1 - hit
        cross = jnp.minimum(side_i, side_j)
        go_i = adv * take_i
        go_j = adv * (1 - take_i)
        map_i = map_i + go_i * step_i
        map_j = map_j + go_j * step_j
        side_i = side_i + go_i.astype(dx.dtype) * delta_i
        side_j = side_j + go_j.astype(dx.dtype) * delta_j
        idx = jnp.clip(map_i, 0, h - 1) * w + jnp.clip(map_j, 0, w - 1)
        word_idx = idx >> 5
        bit_idx = (idx & 31).astype(jnp.uint32)
        occ_word = _select_word(words_ref, word_idx, dx.shape, n_words, 0)
        occ = ((occ_word >> bit_idx) & jnp.uint32(1)).astype(jnp.int32)
        newly = adv * occ
        newly_f = newly.astype(dx.dtype)
        hit_dim = hit_dim * (1 - newly) + (1 - take_i) * newly
        dist = dist * (1.0 - newly_f) + cross * newly_f
        hit = jnp.maximum(hit, occ)
        return map_i, map_j, side_i, side_j, hit, hit_dim, dist

    map_i, map_j, side_i, side_j, hit, hit_dim, dist = jax.lax.fori_loop(
        0, max_steps, body,
        (map_i, map_j, side_i, side_j, hit, hit_dim, dist),
    )

    # ---- render epilogue (render.render_camera_u32, same op order) -------
    # Wall/goal/block color per ray from the hit tile's channel bits.
    idx = jnp.clip(map_i, 0, h - 1) * w + jnp.clip(map_j, 0, w - 1)
    word_idx = idx >> 5
    bit_idx = (idx & 31).astype(jnp.uint32)
    wall_word = _select_word(words_ref, word_idx, dx.shape, n_words, n_words)
    is_wall = ((wall_word >> bit_idx) & jnp.uint32(1)).astype(jnp.int32)
    dim_i = 1 - hit_dim  # hit_dim == 0 -> face perpendicular to i
    wall_c = jnp.where(
        dim_i == 1, jnp.uint32(colors.WALL_DIM_I), jnp.uint32(colors.WALL_DIM_J)
    )
    goal_c = jnp.where(
        dim_i == 1, jnp.uint32(colors.GOAL_DIM_I), jnp.uint32(colors.GOAL_DIM_J)
    )
    slab = jnp.where(is_wall == 1, wall_c, goal_c)
    if has_blocks:
        block_word = _select_word(
            words_ref, word_idx, dx.shape, n_words, 2 * n_words
        )
        is_block = ((block_word >> bit_idx) & jnp.uint32(1)).astype(jnp.int32)
        block_c = jnp.where(
            dim_i == 1,
            jnp.uint32(colors.BLOCK_DIM_I),
            jnp.uint32(colors.BLOCK_DIM_J),
        )
        slab = jnp.where(is_block * (1 - is_wall) == 1, block_c, slab)

    # Fisheye-corrected depth (ref :404) and column height (ref :406-411).
    pdx = pdx_ref[:, :]  # [BLK, 1] player direction
    pdy = pdy_ref[:, :]
    proj = dist * (pdx * dx + pdy * dy)
    height_line = jnp.asarray(num_f, dx.dtype) / (
        jnp.asarray(denom_f, dx.dtype) * proj
    )
    finite = jnp.isfinite(height_line)
    h_pu = jnp.where(
        finite,
        jnp.floor(
            jnp.minimum(height_line, jnp.asarray(hpu, dx.dtype))
        ).astype(jnp.int32),
        hpu,
    )
    full = jnp.where(h_pu >= hpu - 1, 1, 0)
    # (hpu - h_pu) // 2 == >> 1 for the non-negative clamped height.
    pad = jnp.where(full == 1, 0, (hpu - h_pu) >> 1)  # i32[BLK, R]

    # Composite [BLK, H_pu, R]: ceiling rows < pad, floor rows >= hpu - pad.
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hpu, 1), 1)
    pad3 = pad[:, None, :]
    slab3 = slab[:, None, :]
    img = jnp.where(
        row < pad3,
        jnp.uint32(colors.CEILING),
        jnp.where(
            row >= hpu - pad3,
            jnp.uint32(colors.FLOOR),
            jnp.broadcast_to(slab3, (dx.shape[0], hpu, dx.shape[1])),
        ),
    )
    img_ref[:, :, :] = img


@functools.partial(
    jax.jit,
    static_argnames=("shape", "max_steps", "hpu", "num_f", "denom_f", "block_envs"),
)
def render_camera_fused_batched(
    obstacle_words: jax.Array,          # u32[B, NW]
    wall_words: jax.Array,              # u32[B, NW]
    shape: Tuple[int, int],
    pos_wu: jax.Array,                  # f32[B, 2]
    player_dir_wu: jax.Array,           # f32[B, 2]
    ray_dirs_flipped: jax.Array,        # f32[B, R, 2], mirror-ordered fan
    max_steps: int,
    hpu: int,
    num_f: float,
    denom_f: float,
    block_words: Optional[jax.Array] = None,
    block_envs: int = 0,
) -> jax.Array:
    """uint32[B, hpu, R] camera views for the whole batch in one fused
    Mosaic kernel (bit-identical to scan+render under CPU interpret;
    ulp-level pixel differences on TPU hardware — see module docstring).
    ``num_f``/``denom_f`` are the host-derived float32 render constants
    (render.render_camera_u32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, r, _ = ray_dirs_flipped.shape
    h, w = shape
    nw = obstacle_words.shape[-1]

    if block_envs <= 0:
        # Size the env block so the double-buffered image block stays ~2 MiB.
        img_bytes = hpu * r * 4
        block_envs = max(1, min(128, (2 * 1024 * 1024) // img_bytes))
    blk = min(block_envs, b)
    while b % blk:
        blk -= 1

    dx = ray_dirs_flipped[:, :, 0]
    dy = ray_dirs_flipped[:, :, 1]
    px = pos_wu[:, 0:1]
    py = pos_wu[:, 1:2]
    pdx = player_dir_wu[:, 0:1]
    pdy = player_dir_wu[:, 1:2]

    parts = [obstacle_words, wall_words]
    if block_words is not None:
        parts.append(block_words)
    words = jnp.concatenate(parts, axis=-1)  # [B, nw * len(parts)]

    kernel = functools.partial(
        _kernel,
        h=h, w=w, n_words=nw, max_steps=max_steps, hpu=hpu,
        has_blocks=block_words is not None, num_f=num_f, denom_f=denom_f,
    )
    env_spec = lambda cols: pl.BlockSpec(
        (blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    img = pl.pallas_call(
        kernel,
        grid=(b // blk,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            env_spec(r), env_spec(r),
            env_spec(1), env_spec(1), env_spec(1), env_spec(1),
            env_spec(words.shape[-1]),
        ],
        out_specs=pl.BlockSpec(
            (blk, hpu, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hpu, r), jnp.uint32),
    )(dx, dy, px, py, pdx, pdy, words)
    return img


def render_camera_fused(
    cfg: EnvConfig,
    obstacle_words: jax.Array,   # u32[B, NW]
    wall_words: jax.Array,       # u32[B, NW]
    pos_wu: jax.Array,           # f32[B, 2]
    dir_au: jax.Array,           # i32[B]
    block_words: Optional[jax.Array] = None,
) -> jax.Array:
    """Config-level entry: LUT fan lookup (mirror-ordered) + fused kernel.
    Returns uint32[B, H_pu, R], bit-identical to the scan+render path."""
    import numpy as np

    from . import lut as lut_ops

    dirs = lut_ops.take_rows(
        jnp.asarray(cfg.ray_fan_lut_flipped), dir_au
    )  # [B, R, 2]
    pdir = lut_ops.take_rows(
        jnp.asarray(cfg.directions_wu, pos_wu.dtype), dir_au
    )  # [B, 2]
    num_f = float(np.float32(cfg.camera_height_tile_wu * cfg.num_rays))
    denom_f = float(np.float32(2.0 * cfg.semi_field_of_view_wu))
    return render_camera_fused_batched(
        obstacle_words,
        wall_words,
        (cfg.H, cfg.W),
        pos_wu,
        pdir,
        dirs,
        cfg.dda_steps,
        cfg.height_camera_view_pu,
        num_f,
        denom_f,
        block_words=block_words,
    )
