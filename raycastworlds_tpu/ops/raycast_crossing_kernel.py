"""Pallas (Mosaic) kernel for the loop-free crossing raycaster.

Why a kernel when the XLA crossing formulation already won round 2: at
large ray counts the XLA program materializes the [B, N, R] candidate
arrays through HBM around the reduction that consumes them — measured at
the reference-default resolution (512 rays) the cast alone is ~12x off its
VPU-op bound and ~75% of the step (docs/RESULTS.md round 4).  Here the
candidate loop runs INSIDE the kernel over k with the running
lexicographic min carried in registers, so per (env-block, ray-block) the
only HBM traffic is the inputs ([E, R] direction components, [E, N*n_lw]
candidate line words) and the [E, R] outputs — the [N, R] intermediate
never exists in memory.

Same closed forms as ops/raycast._crossing_axis (the add-then-divide
``t = (frac + k)/|d|`` is not FMA-contractible, so distances round
identically); the cross coordinate ``c = p + t*d`` IS a mul+add that
Mosaic may contract into an FMA underneath HLO, which can flip the entered
tile only at exact-corner float coincidences — the same documented caveat
as the other Pallas backends.  Agreement with the XLA crossing path is
asserted empirically over random states in tests (exact on every state
tested on both CPU-interpret and v5e); the bit-exact parity GUARANTEE
stays pinned to the XLA crossing backend.

Reference contract: /root/reference/src/single_room.jl:223-227.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitmap
from .raycast import _col_line_words, _row_line_words

_E_BLK = 8  # env rows per block (f32 sublane granularity)


def _axis_loop(
    d_main, d_cross, p_main, p_cross, n, size_cross, main_is_i,
    wp_ref, wm_ref, m0_ref, n_lw,
):
    """Running lexicographic min over this axis's n crossing candidates.

    All operands are [E, Rb] vectors (or [E, 1] per-env scalars); the loop
    carries (best_t, best_k, best_cross_tile) in registers.  Expressions
    mirror ops/raycast._crossing_axis exactly.
    """
    f32 = d_main.dtype
    big = jnp.asarray(jnp.finfo(f32).max, f32)
    step = jnp.where(d_main < 0, -1, 1).astype(jnp.int32)    # [E, Rb]
    frac = p_main - jnp.floor(p_main)                        # [E, 1]
    frac_sel = jnp.where(d_main < 0, frac, 1.0 - frac)       # [E, Rb]
    ad = jnp.abs(d_main)
    m0 = m0_ref[:]                                           # [E, 1] i32
    step_pos = d_main >= 0                                   # step > 0
    # Load the candidate words ONCE ([E, n*n_lw] — a few hundred bytes per
    # env row); the per-k word is then a STATIC lane slice of the loaded
    # value.  (A dynamic in-loop lane index is rejected by Mosaic — vector
    # loads need 128-aligned dynamic offsets — so the candidate loop is a
    # static Python unroll over k, which also lets the compiler schedule
    # the whole reduction without loop-carry barriers.)
    wp = wp_ref[:]                                           # u32[E, n*n_lw]
    wm = wm_ref[:]

    best = jnp.full(d_main.shape, big, f32)
    kb = jnp.zeros(d_main.shape, jnp.int32)
    cb = jnp.zeros(d_main.shape, jnp.int32)
    for k in range(n):
        # add-then-divide: uncontractible, rounds like the XLA path
        t = (frac_sel + jnp.float32(k)) / ad                 # [E, Rb]
        finite = jnp.isfinite(t)
        c = p_cross + t * d_cross
        c = jnp.where(finite, c, 0.0)
        if main_is_i:
            c_tile = jnp.where(
                d_cross >= 0, jnp.floor(c), jnp.ceil(c) - 1.0
            )
        else:
            c_tile = jnp.where(
                d_cross > 0, jnp.ceil(c) - 1.0, jnp.floor(c)
            )
        c_idx = jnp.clip(c_tile, 0.0, float(size_cross - 1)).astype(
            jnp.int32
        )
        bit = (c_idx & 31).astype(jnp.uint32)
        occ = jnp.zeros(t.shape, jnp.bool_)
        for q in range(n_lw):
            wp_q = wp[:, k * n_lw + q][:, None]              # u32[E, 1]
            wm_q = wm[:, k * n_lw + q][:, None]
            word_q = jnp.where(step_pos, wp_q, wm_q)         # u32[E, Rb]
            hit_q = ((word_q >> bit) & jnp.uint32(1)) == 1
            if n_lw == 1:
                occ = hit_q
            else:
                occ = occ | (hit_q & ((c_idx >> 5) == q))
        occ = occ & finite
        t_m = jnp.where(occ, t, big)
        # ascending k: strict < keeps the FIRST minimum = argmin's rule
        better = t_m < best
        best = jnp.where(better, t_m, best)
        kb = jnp.where(better, k, kb)
        cb = jnp.where(better, c_idx, cb)
    m_best = m0 + (kb + 1) * step
    return best, m_best, cb


def _kernel(
    dx_ref, dy_ref, px_ref, py_ref,
    wpi_ref, wmi_ref, wpj_ref, wmj_ref,
    m0i_ref, m0j_ref,
    dist_ref, hi_ref, hj_ref, hd_ref,
    *, h: int, w: int, n_lw_i: int, n_lw_j: int,
):
    dist, hit_i, hit_j, use_j = _cast_block(
        dx_ref[:], dy_ref[:], px_ref[:], py_ref[:],
        wpi_ref, wmi_ref, wpj_ref, wmj_ref, m0i_ref, m0j_ref,
        h, w, n_lw_i, n_lw_j,
    )
    dist_ref[:] = dist
    hd_ref[:] = jnp.where(use_j, 1, 0).astype(jnp.int32)
    hi_ref[:] = hit_i
    hj_ref[:] = hit_j


def _candidate_words(line_words, main0, n, size_main):
    """u32[B, n, n_lw] candidate occupancy words for both step signs.

    ``line_words``: u32[B, n_lw, size_main] per-line occupancy words.
    Candidate k enters line ``main0 +- (k+1)`` — the word depends on the
    ray only through the step sign, so both variants are gathered here
    (tiny [B, n] take_along_axis) and selected per ray inside the kernel.
    """
    ks = jnp.arange(n, dtype=jnp.int32)
    m_plus = jnp.clip(main0[:, None] + ks[None, :] + 1, 0, size_main - 1)
    m_minus = jnp.clip(main0[:, None] - (ks[None, :] + 1), 0, size_main - 1)
    iota = jnp.arange(size_main, dtype=jnp.int32)

    def take(m):
        # one-hot where-sum instead of take_along_axis: gathers are the
        # serialized slow path on TPU (a take_along_axis here measured the
        # whole kernel backend 13x slower than XLA crossing)
        onehot = (
            m[:, :, None, None] == iota[None, None, None, :]
        )                                                     # [B, n, 1, M]
        return jnp.sum(
            jnp.where(onehot, line_words[:, None, :, :], jnp.uint32(0)),
            axis=-1,
        )                                                     # [B, n, n_lw]

    return take(m_plus), take(m_minus)


def _cast_block(dx, dy, px, py, wpi_ref, wmi_ref, wpj_ref, wmj_ref,
                m0i_ref, m0j_ref, h, w, n_lw_i, n_lw_j):
    """Shared cast body: both axes + combination, on one [E, Rb] block."""
    ti, ii, ji = _axis_loop(
        dx, dy, px, py, h, w, True, wpi_ref, wmi_ref, m0i_ref, n_lw_i
    )
    tj, jj, ij = _axis_loop(
        dy, dx, py, px, w, h, False, wpj_ref, wmj_ref, m0j_ref, n_lw_j
    )
    use_j = tj <= ti  # ties check j first, like the sequential march
    dist = jnp.where(use_j, tj, ti)
    hit_i = jnp.where(use_j, ij, ii)
    hit_j = jnp.where(use_j, jj, ji)
    return dist, hit_i, hit_j, use_j


def _render_pal8_kernel(
    dx_ref, dy_ref, px_ref, py_ref,
    wpi_ref, wmi_ref, wpj_ref, wmj_ref,
    m0i_ref, m0j_ref, pdx_ref, pdy_ref, gi_ref, gj_ref,
    img_ref,
    *, h: int, w: int, n_lw_i: int, n_lw_j: int,
    hpu: int, num: float, denom: float, e_blk: int,
):
    """Cast + pal8 camera compositing in ONE kernel
    (``raycast_backend="crossing_kernel_fused"``).

    The ray fan arrives PRE-FLIPPED (cfg.ray_fan_lut_flipped), so image
    columns come out in natural order — the mirror (ref :431) costs
    nothing.  Column geometry mirrors ops/render._column_pads; slab color
    is goal-vs-wall by hit-tile equality with the (single) goal tile,
    equivalent to the wall-bit lookup whenever the obstacle union is
    walls | goal and the goal sits on an empty tile (all single-goal
    families) — multi-goal/block layers fall back to the XLA render.

    Measured verdict (docs/RESULTS.md round 4): vs the split kernel +
    XLA render, +5% at config-3 (5.14M) but -9% at reference-default
    (1.71M vs 1.87M) — the per-env compositing loop doesn't beat XLA's
    fused render, so this stays an explicit option rather than the
    recommended path.
    """
    from .. import colors

    dx = dx_ref[:]
    dy = dy_ref[:]
    dist, hit_i, hit_j, use_j = _cast_block(
        dx, dy, px_ref[:], py_ref[:], wpi_ref, wmi_ref, wpj_ref, wmj_ref,
        m0i_ref, m0j_ref, h, w, n_lw_i, n_lw_j,
    )
    f32 = dist.dtype
    proj = dist * (pdx_ref[:] * dx + pdy_ref[:] * dy)         # [E, Rb]
    height_line = jnp.float32(num) / (jnp.float32(denom) * proj)
    finite = jnp.isfinite(height_line)
    h_pu = jnp.where(
        finite,
        jnp.floor(
            jnp.minimum(height_line, jnp.asarray(hpu, f32))
        ).astype(jnp.int32),
        hpu,
    )
    full = h_pu >= hpu - 1
    pad = jnp.where(full, 0, (hpu - h_pu) // 2)               # [E, Rb]
    dim_i = jnp.logical_not(use_j)
    is_goal = (hit_i == gi_ref[:]) & (hit_j == gj_ref[:])
    # compositing stays in int32 lanes (mixing (8,128)-tiled bools with
    # (32,128)-tiled u8 vectors trips Mosaic relayout); one i32->u8
    # conversion happens at the final image write
    slab = jnp.where(
        is_goal,
        jnp.where(
            dim_i, colors.PAL_GOAL_DIM_I, colors.PAL_GOAL_DIM_J
        ),
        jnp.where(
            dim_i, colors.PAL_WALL_DIM_I, colors.PAL_WALL_DIM_J
        ),
    ).astype(jnp.int32)                                        # i32[E, Rb]
    r_blk = dx.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (hpu, r_blk), 0)
    for e in range(e_blk):
        pad_e = pad[e][None, :]                                # [1, Rb]
        img = jnp.where(
            rows < pad_e,
            colors.PAL_CEILING,
            jnp.where(
                rows >= hpu - pad_e,
                colors.PAL_FLOOR,
                slab[e][None, :],
            ),
        )
        img_ref[e] = img.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("shape", "hpu", "num", "denom", "interpret"),
)
def cast_render_pal8_kernel(
    obstacle_words: jax.Array,   # u32[B, NW]
    shape: Tuple[int, int],
    pos_wu: jax.Array,           # f32[B, 2]
    ray_dirs_flipped: jax.Array,  # f32[B, R, 2] — PRE-FLIPPED fan
    player_dir: jax.Array,       # f32[B, 2]
    goal_tu: jax.Array,          # i32[B, 2]
    hpu: int,
    num: float,
    denom: float,
    interpret: bool = False,
) -> jax.Array:
    """uint8[B, hpu, R] pal8 camera images, cast + render fused in-kernel."""
    h, w = shape
    b, r, _ = ray_dirs_flipped.shape
    if b % _E_BLK:
        raise ValueError(f"kernel backend needs num_envs % {_E_BLK} == 0")
    r_blk = r if r <= 512 else 128
    if r % r_blk:
        raise ValueError("num_rays must be <= 512 or a multiple of 128")

    (px, py, main0_i, main0_j, wpi, wmi, wpj, wmj) = _kernel_operands(
        obstacle_words, shape, pos_wu
    )
    dx = ray_dirs_flipped[:, :, 0]
    dy = ray_dirs_flipped[:, :, 1]
    pdx = player_dir[:, 0:1]
    pdy = player_dir[:, 1:2]
    gi = goal_tu[:, 0:1]
    gj = goal_tu[:, 1:2]

    grid = (b // _E_BLK, r // r_blk)

    def env_spec(cols):
        return pl.BlockSpec(
            (_E_BLK, cols), lambda e, j: (e, 0), memory_space=pltpu.VMEM
        )

    ray_spec = pl.BlockSpec(
        (_E_BLK, r_blk), lambda e, j: (e, j), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec(
        (_E_BLK, hpu, r_blk), lambda e, j: (e, 0, j),
        memory_space=pltpu.VMEM,
    )
    kern = functools.partial(
        _render_pal8_kernel, h=h, w=w,
        n_lw_i=wpi.shape[1] // h, n_lw_j=wpj.shape[1] // w,
        hpu=hpu, num=num, denom=denom, e_blk=_E_BLK,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            ray_spec, ray_spec,
            env_spec(1), env_spec(1),
            env_spec(wpi.shape[1]), env_spec(wpi.shape[1]),
            env_spec(wpj.shape[1]), env_spec(wpj.shape[1]),
            env_spec(1), env_spec(1),
            env_spec(1), env_spec(1), env_spec(1), env_spec(1),
        ],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((b, hpu, r), jnp.uint8),
        interpret=interpret,
    )(dx, dy, px, py, wpi, wmi, wpj, wmj, main0_i, main0_j,
      pdx, pdy, gi, gj)


def _kernel_operands(obstacle_words, shape, pos_wu):
    """Shared host-side (XLA) precompute: positions, first-tile indices, and
    per-candidate occupancy words for both axes and step signs."""
    h, w = shape
    b = pos_wu.shape[0]
    dense = jax.vmap(
        lambda ww: bitmap.unpack_bits(ww, (h, w)).astype(jnp.uint32)
    )(obstacle_words)
    row_words = jax.vmap(lambda d: jnp.stack(_row_line_words(d)))(dense)
    col_words = jax.vmap(lambda d: jnp.stack(_col_line_words(d)))(dense)
    n_lw_i = row_words.shape[1]
    n_lw_j = col_words.shape[1]
    px = pos_wu[:, 0:1]
    py = pos_wu[:, 1:2]
    main0_i = jnp.floor(px).astype(jnp.int32)
    main0_j = jnp.floor(py).astype(jnp.int32)
    wpi, wmi = _candidate_words(row_words, main0_i[:, 0], h, h)
    wpj, wmj = _candidate_words(col_words, main0_j[:, 0], w, w)
    return (
        px, py, main0_i, main0_j,
        wpi.reshape(b, h * n_lw_i), wmi.reshape(b, h * n_lw_i),
        wpj.reshape(b, w * n_lw_j), wmj.reshape(b, w * n_lw_j),
    )


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def cast_rays_crossing_kernel(
    obstacle_words: jax.Array,   # u32[B, NW]
    shape: Tuple[int, int],
    pos_wu: jax.Array,           # f32[B, 2]
    ray_dirs: jax.Array,         # f32[B, R, 2]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch crossing cast via the Pallas kernel.

    Returns (hit_tu i32[B, R, 2], hit_dim i32[B, R], dist f32[B, R]).
    Requires B % 8 == 0 (env-block granularity); rays are processed in one
    lane block (R <= 512) or 128-wide chunks.
    """
    h, w = shape
    b, r, _ = ray_dirs.shape
    if b % _E_BLK:
        raise ValueError(f"kernel backend needs num_envs % {_E_BLK} == 0")
    r_blk = r if r <= 512 else 128
    if r % r_blk:
        raise ValueError("num_rays must be <= 512 or a multiple of 128")

    (px, py, main0_i, main0_j, wpi, wmi, wpj, wmj) = _kernel_operands(
        obstacle_words, shape, pos_wu
    )
    n_lw_i = wpi.shape[1] // h
    n_lw_j = wpj.shape[1] // w

    dx = ray_dirs[:, :, 0]
    dy = ray_dirs[:, :, 1]

    grid = (b // _E_BLK, r // r_blk)

    def env_spec(cols):
        return pl.BlockSpec(
            (_E_BLK, cols), lambda e, j: (e, 0), memory_space=pltpu.VMEM
        )

    ray_spec = pl.BlockSpec(
        (_E_BLK, r_blk), lambda e, j: (e, j), memory_space=pltpu.VMEM
    )

    kern = functools.partial(
        _kernel, h=h, w=w, n_lw_i=n_lw_i, n_lw_j=n_lw_j
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, r), jnp.float32),
        jax.ShapeDtypeStruct((b, r), jnp.int32),
        jax.ShapeDtypeStruct((b, r), jnp.int32),
        jax.ShapeDtypeStruct((b, r), jnp.int32),
    ]
    dist, hit_i, hit_j, hit_dim = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            ray_spec, ray_spec,                      # dx, dy
            env_spec(1), env_spec(1),                # px, py
            env_spec(h * n_lw_i), env_spec(h * n_lw_i),  # wpi, wmi
            env_spec(w * n_lw_j), env_spec(w * n_lw_j),  # wpj, wmj
            env_spec(1), env_spec(1),                # main0 i/j
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(dx, dy, px, py, wpi, wmi, wpj, wmj, main0_i, main0_j)
    return jnp.stack([hit_i, hit_j], axis=-1), hit_dim, dist
