"""Golden-image snapshots: one fixed-seed camera frame per family/texture,
checked against an npz of SHA-pinned frames in tests/data/golden_frames.npz.

Complements the oracle parity tests with a defense they can't provide: the
oracles are re-derived implementations, so a palette constant or layout
convention changed *everywhere at once* would slip through backend-vs-oracle
comparison.  The snapshots pin the actual bytes.

Regenerate deliberately after an intended visual change:
    python -m tests.test_golden_images --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_frames.npz")


def _cases():
    return {
        "single_room": rcw.SingleRoom(
            rcw.EnvConfig(num_rays=64, height_camera_view_pu=48)
        ),
        "single_room_checker": rcw.SingleRoom(
            rcw.EnvConfig(
                num_rays=64, height_camera_view_pu=48,
                wall_texture="checker", texture_cells=8,
            )
        ),
        "single_room_brick": rcw.SingleRoom(
            rcw.EnvConfig(
                num_rays=64, height_camera_view_pu=48,
                wall_texture="brick", texture_cells=8,
            )
        ),
        "single_room_xor": rcw.SingleRoom(
            rcw.EnvConfig(
                num_rays=64, height_camera_view_pu=48,
                wall_texture="xor", texture_cells=8,
            )
        ),
        "maze": rcw.Maze(
            rcw.MazeConfig(
                height_tile_map_tu=11, width_tile_map_tu=11,
                num_rays=64, height_camera_view_pu=48,
            )
        ),
        "random_room": rcw.RandomRoom(
            rcw.RandomRoomConfig(
                height_tile_map_tu=12, width_tile_map_tu=12,
                num_rays=64, height_camera_view_pu=48,
            )
        ),
        "multi_goal": rcw.MultiGoalRoom(
            rcw.MultiGoalConfig(
                num_goals=3, num_rays=64, height_camera_view_pu=48
            )
        ),
        "locked_room": rcw.LockedRoom(
            rcw.LockedRoomConfig(num_rays=64, height_camera_view_pu=48)
        ),
        "dynamic_room": rcw.DynamicRoom(
            rcw.DynamicRoomConfig(
                num_blocks=3, num_rays=64, height_camera_view_pu=48
            )
        ),
        "top_view": rcw.SingleRoom(
            rcw.EnvConfig(
                num_rays=32, pu_per_tu=8, obs_type="top_u32"
            )
        ),
        "multi_player": rcw.MultiPlayerRoom(
            rcw.MultiPlayerConfig(
                num_players=2, num_rays=64, height_camera_view_pu=48
            )
        ),
    }


def _frame(game) -> np.ndarray:
    # A couple of deterministic steps past a fresh spawn, kept short so the
    # frame keeps scene structure (players spawn at tile centers; a long
    # scripted walk tends to end nose-against-a-wall in a uniform frame,
    # which pins nothing).  First seed whose frame has ≥3 distinct colors
    # wins — deterministic, and regen asserts the same property.
    reset = jax.jit(game.reset_single)
    step = jax.jit(game.step_single)
    observe = jax.jit(game.observe_single)
    ashape = getattr(game, "action_shape", ())
    for seed in (1234, 7, 42, 99):
        state = reset(jax.random.PRNGKey(seed))
        for a in (2, 0, 3):
            act = jnp.full(ashape, a, jnp.int32) if ashape else jnp.int32(a)
            state = step(state, act)
        frame = np.asarray(observe(state))
        if len(np.unique(frame)) >= 3:
            return frame
    raise AssertionError("no structural snapshot found — adjust seeds/steps")


@pytest.mark.parametrize("name", sorted(_cases().keys()))
def test_golden_frame(name):
    if not os.path.exists(_DATA):
        pytest.skip("golden_frames.npz not generated")
    golden = np.load(_DATA)
    assert name in golden.files, f"{name} missing from golden set — regen"
    np.testing.assert_array_equal(_frame(_cases()[name]), golden[name])


if __name__ == "__main__":
    import sys

    # Snapshots are CPU-defined (the parity reference platform); force it
    # before any tracing so a bare `python -m` run doesn't hit the TPU
    # tunnel.
    jax.config.update("jax_platforms", "cpu")

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(_DATA), exist_ok=True)
        frames = {k: _frame(g) for k, g in _cases().items()}
        np.savez_compressed(_DATA, **frames)
        for k, v in frames.items():
            print(f"{k}: {v.shape} {v.dtype} sum={int(np.sum(v, dtype=np.uint64))}")
        print(f"wrote {_DATA}")
