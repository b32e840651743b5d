"""Render palette.

Byte-for-byte the reference's twelve 0x00RRGGBB constants
(/root/reference/src/single_room.jl:288-296) plus the grid-line gray used by
``draw_tile_map!`` (/root/reference/src/single_room.jl:364-367).
"""

from __future__ import annotations

import numpy as np

# tile_map_colors, indexed by object channel then "empty" last
# (reference :288: (wall, goal, empty)).
TILE_WALL = 0x00FFFFFF
TILE_GOAL = 0x00FF0000
TILE_EMPTY = 0x00000000

RAY = 0x00808080
PLAYER = 0x00C0C0C0
FLOOR = 0x00404040
CEILING = 0x00FFFFFF
WALL_DIM_I = 0x00808080   # hit face perpendicular to i-axis (reference dim 1)
WALL_DIM_J = 0x00C0C0C0   # hit face perpendicular to j-axis (reference dim 2)
GOAL_DIM_I = 0x00800000
GOAL_DIM_J = 0x00C00000
GRID_LINE = 0x00CCCCCC

# Moving-obstacle blocks (DynamicRoom; no reference equivalent — the
# reference palette stops at wall/goal shades).  Blue two-shade pair in the
# same fake-lighting style as the wall/goal pairs.
TILE_BLOCK = 0x000000FF
BLOCK_DIM_I = 0x00000080
BLOCK_DIM_J = 0x000000C0


# ---------------------------------------------------------------------------
# Canonical palette for 1-byte indexed observations ("camera_pal8").
#
# The whole render vocabulary above is 12 DISTINCT 0x00RRGGBB values — the
# scene is a palette image by construction, so a uint8 index carries exactly
# the same information as the uint32 pixel at 1/4 the HBM traffic (every
# headline throughput row is observation-bandwidth-bound; docs/RESULTS.md).
# Index order is frozen: parity tests and trained policies depend on it.
# ---------------------------------------------------------------------------

PALETTE = (
    0x00000000,  # 0  black (empty tile)
    0x00FFFFFF,  # 1  white (ceiling, tile-map wall)
    0x00808080,  # 2  gray (wall face dim-i, top-view rays)
    0x00C0C0C0,  # 3  light gray (wall face dim-j, player)
    0x00404040,  # 4  dark gray (floor)
    0x00FF0000,  # 5  red (tile-map goal)
    0x00800000,  # 6  dark red (goal face dim-i)
    0x00C00000,  # 7  mid red (goal face dim-j)
    0x00CCCCCC,  # 8  grid-line gray
    0x000000FF,  # 9  blue (tile-map block)
    0x00000080,  # 10 dark blue (block face dim-i)
    0x000000C0,  # 11 mid blue (block face dim-j)
)

PAL_EMPTY = 0
PAL_CEILING = 1
PAL_WALL_DIM_I = 2
PAL_WALL_DIM_J = 3
PAL_FLOOR = 4
PAL_GOAL = 5
PAL_GOAL_DIM_I = 6
PAL_GOAL_DIM_J = 7
PAL_GRID_LINE = 8
PAL_BLOCK = 9
PAL_BLOCK_DIM_I = 10
PAL_BLOCK_DIM_J = 11

PALETTE_NP = np.array(PALETTE, dtype=np.uint32)
# [12, 3] float32 RGB in [0, 1] — the learner-side decode table
# (parallel/ppo.preprocess_obs one-hot-contracts indices against this).
PALETTE_RGB_F32 = (
    np.stack(
        [(PALETTE_NP >> 16) & 0xFF, (PALETTE_NP >> 8) & 0xFF, PALETTE_NP & 0xFF],
        axis=-1,
    ).astype(np.float32)
    / 255.0
)


def pal8_to_u32_np(img_pal8: np.ndarray) -> np.ndarray:
    """Decode a palette-index image to 0x00RRGGBB uint32 (host side)."""
    return PALETTE_NP[np.asarray(img_pal8, dtype=np.int64)]


def u32_to_rgb(img_u32: np.ndarray) -> np.ndarray:
    """Unpack 0x00RRGGBB uint32 image to uint8 [..., 3] RGB."""
    img_u32 = np.asarray(img_u32, dtype=np.uint32)
    r = (img_u32 >> 16) & 0xFF
    g = (img_u32 >> 8) & 0xFF
    b = img_u32 & 0xFF
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def rgb_to_u32(rgb: np.ndarray) -> np.ndarray:
    rgb = np.asarray(rgb, dtype=np.uint32)
    return (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]
