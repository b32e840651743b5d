"""Pallas TPU kernel for the DDA raycaster.

Same contract and same float32 operation order as ``raycast.cast_rays_scan``
(Lodev DDA over bit-packed maps, /opt pallas-guide style), but as one fused
Mosaic kernel: a block of envs per program, the whole march in an in-kernel
``fori_loop`` over VMEM-resident [BLK, R] registers — no XLA scan overhead,
no intermediate HBM round-trips.  The packed obstacle words ride along as a
[BLK, n_words] VMEM block; the per-lane word select is a static loop of
multiply-adds (no gather), identical to ops/bitmap.lookup_bit.

Because the arithmetic sequence matches the scan backend exactly, results
are bit-identical to it (and therefore to the NumPy oracle).

Use via ``EnvConfig(raycast_backend="pallas")``; falls back to the scan
backend on non-TPU platforms.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from .raycast import RayHits


def _kernel(
    dx_ref, dy_ref, px_ref, py_ref, words_ref,
    hit_i_ref, hit_j_ref, hit_dim_ref, dist_ref,
    *, h: int, w: int, n_words: int, max_steps: int,
):
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    px = px_ref[:, :]  # [BLK, 1]
    py = py_ref[:, :]

    map_i0 = jnp.floor(px).astype(jnp.int32)  # [BLK, 1]
    map_j0 = jnp.floor(py).astype(jnp.int32)
    map_i = jnp.broadcast_to(map_i0, dx.shape)
    map_j = jnp.broadcast_to(map_j0, dx.shape)

    delta_i = jnp.abs(1.0 / dx)
    delta_j = jnp.abs(1.0 / dy)
    step_i = jnp.where(dx < 0, -1, 1).astype(jnp.int32)
    step_j = jnp.where(dy < 0, -1, 1).astype(jnp.int32)

    frac_i = px - jnp.floor(px)
    frac_j = py - jnp.floor(py)
    side_i = jnp.where(dx < 0, frac_i, 1.0 - frac_i) * delta_i
    side_j = jnp.where(dy < 0, frac_j, 1.0 - frac_j) * delta_j

    big = jnp.asarray(jnp.finfo(dx.dtype).max, dx.dtype)
    # Masks are kept as 0/1 int32 throughout: Mosaic mis-lays-out mixed-rank
    # i1 vectors (arith.ori on vector<8x128x32xi1> vs vector<8x128xi1>), so
    # boolean vector algebra is avoided entirely.  0/1 integer blends are
    # bit-exact.
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
        idx = (
            jnp.clip(map_i, 0, h - 1) * w + jnp.clip(map_j, 0, w - 1)
        )
        word_idx = idx >> 5
        bit_idx = (idx & 31).astype(jnp.uint32)
        occ_word = jnp.zeros(dx.shape, jnp.uint32)
        for k in range(n_words):
            wk = words_ref[:, k][:, None]  # [BLK, 1] u32
            sel = jnp.where(word_idx == k, jnp.uint32(1), jnp.uint32(0))
            occ_word = occ_word + sel * jnp.broadcast_to(wk, dx.shape)
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
    hit_i_ref[:, :] = map_i
    hit_j_ref[:, :] = map_j
    hit_dim_ref[:, :] = hit_dim
    dist_ref[:, :] = dist


@functools.partial(jax.jit, static_argnames=("shape", "max_steps", "block_envs"))
def cast_rays_pallas_batched(
    obstacle_words: jax.Array,   # u32[B, NW]
    shape: Tuple[int, int],
    pos_wu: jax.Array,           # f32[B, 2]
    ray_dirs: jax.Array,         # f32[B, R, 2]
    max_steps: int,
    block_envs: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched Pallas DDA.  Returns (hit_tu i32[B, R, 2], hit_dim i32[B, R],
    dist f32[B, R])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, r, _ = ray_dirs.shape
    h, w = shape
    nw = obstacle_words.shape[-1]
    blk = min(block_envs, b)
    if b % blk:
        raise ValueError(f"batch {b} not divisible by block {blk}")

    dx = ray_dirs[:, :, 0]
    dy = ray_dirs[:, :, 1]
    px = pos_wu[:, 0:1]
    py = pos_wu[:, 1:2]

    kernel = functools.partial(
        _kernel, h=h, w=w, n_words=nw, max_steps=max_steps
    )
    grid = (b // blk,)
    env_spec = lambda cols: pl.BlockSpec(
        (blk, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            env_spec(r), env_spec(r), env_spec(1), env_spec(1), env_spec(nw),
        ],
        out_specs=[
            env_spec(r), env_spec(r), env_spec(r), env_spec(r),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r), jnp.int32),
            jax.ShapeDtypeStruct((b, r), jnp.int32),
            jax.ShapeDtypeStruct((b, r), jnp.int32),
            jax.ShapeDtypeStruct((b, r), jnp.float32),
        ],
    )(dx, dy, px, py, obstacle_words)
    hit_i, hit_j, hit_dim, dist = out
    return jnp.stack([hit_i, hit_j], axis=-1), hit_dim, dist


def cast_rays_pallas(
    cfg: EnvConfig,
    obstacle_words: jax.Array,
    pos_wu: jax.Array,
    dir_au: jax.Array,
) -> RayHits:
    """Single-env wrapper matching ``raycast.cast_rays``; intended to be
    vmapped — the vmap axis becomes the kernel's env-block axis."""
    dirs = jnp.asarray(cfg.ray_fan_lut)[dir_au]
    hit_tu, hit_dim, dist = cast_rays_pallas_batched(
        obstacle_words[None],
        (cfg.H, cfg.W),
        pos_wu[None],
        dirs[None],
        cfg.dda_steps,
        block_envs=1,
    )
    return RayHits(
        ray_dirs=dirs,
        hit_tu=hit_tu[0],
        hit_dim=hit_dim[0],
        dist_wu=dist[0],
    )
