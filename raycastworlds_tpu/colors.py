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
