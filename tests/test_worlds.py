"""World-family tests: RandomRoom (randomized maps + reachability) and Maze
(procedural multi-room mazes), plus the flood-fill op."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw
from raycastworlds_tpu.models.maze import Maze, MazeConfig
from raycastworlds_tpu.models.random_room import RandomRoom, RandomRoomConfig
from raycastworlds_tpu.ops import flood


def bfs_reachable(walls: np.ndarray, start) -> np.ndarray:
    """Host-side BFS ground truth."""
    h, w = walls.shape
    seen = np.zeros_like(walls, dtype=bool)
    if walls[tuple(start)]:
        return seen
    q = collections.deque([tuple(start)])
    seen[tuple(start)] = True
    while q:
        i, j = q.popleft()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ni, nj = i + di, j + dj
            if 0 <= ni < h and 0 <= nj < w and not walls[ni, nj] and not seen[ni, nj]:
                seen[ni, nj] = True
                q.append((ni, nj))
    return seen


def test_flood_fill_matches_bfs():
    rng = np.random.RandomState(0)
    for _ in range(10):
        walls = rng.rand(12, 14) < 0.35
        walls[0] = walls[-1] = True
        walls[:, 0] = walls[:, -1] = True
        empties = np.argwhere(~walls)
        if len(empties) == 0:
            continue
        seed = empties[rng.randint(len(empties))]
        got = np.asarray(
            jax.jit(flood.flood_fill)(jnp.asarray(~walls), jnp.asarray(seed))
        )
        np.testing.assert_array_equal(got, bfs_reachable(walls, seed))


def test_random_room_reset_invariants():
    cfg = RandomRoomConfig(
        height_tile_map_tu=16, width_tile_map_tu=16,
        num_rays=16, height_camera_view_pu=16, wall_density=0.25,
    )
    game = RandomRoom(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    state = jax.jit(jax.vmap(game.reset_single))(keys)
    walls = np.asarray(state.wall_map)
    goal = np.asarray(state.goal_tu)
    pos = np.asarray(state.pos_wu)
    assert walls[:, 0, :].all() and walls[:, -1, :].all()
    assert walls[:, :, 0].all() and walls[:, :, -1].all()
    # maps actually differ across envs
    assert len({walls[b].tobytes() for b in range(64)}) > 32
    for b in range(64):
        gi, gj = goal[b]
        assert not walls[b, gi, gj]
        spawn = tuple(np.floor(pos[b]).astype(int))
        assert not walls[b][spawn]
        assert (gi, gj) != spawn
        # goal reachable from spawn (BFS ground truth)
        reach = bfs_reachable(walls[b], spawn)
        assert reach[gi, gj], f"env {b}: goal unreachable"


def test_random_room_autoreset_randomizes_map():
    cfg = RandomRoomConfig(
        height_tile_map_tu=16, width_tile_map_tu=16,
        num_rays=16, height_camera_view_pu=16,
    )
    env = rcw.Env(RandomRoom(cfg), num_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(0))
    walls0 = np.asarray(state.wall_map[0]).copy()
    # force env 0 to terminate: place player facing the goal point-blank
    state = state.replace(
        goal_tu=state.goal_tu.at[0].set(jnp.array([8, 8])),
        pos_wu=state.pos_wu.at[0].set(jnp.array([8.5, 7.8])),
        dir_au=state.dir_au.at[0].set(cfg.num_directions // 4),
    ).replace_walls(state.wall_map.at[0, 8, 8].set(False).at[0, 8, 7].set(False))
    res = env.step(state, jnp.zeros(4, jnp.int32))
    assert bool(res.done[0])
    walls1 = np.asarray(res.state.wall_map[0])
    assert not np.array_equal(walls0, walls1), "auto-reset must resample the map"


def test_maze_perfect_connectivity():
    cfg = MazeConfig(num_rays=16, height_camera_view_pu=16)
    game = Maze(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    state = jax.jit(jax.vmap(game.reset_single))(keys)
    walls = np.asarray(state.wall_map)
    goal = np.asarray(state.goal_tu)
    pos = np.asarray(state.pos_wu)
    assert len({walls[b].tobytes() for b in range(32)}) > 16
    for b in range(32):
        # border closed
        assert walls[b, 0, :].all() and walls[b, -1, :].all()
        assert walls[b, :, 0].all() and walls[b, :, -1].all()
        # every empty tile connected to every other (perfect maze + rooms)
        empties = np.argwhere(~walls[b])
        reach = bfs_reachable(walls[b], empties[0])
        assert reach[~walls[b]].all(), f"env {b}: maze not fully connected"
        gi, gj = goal[b]
        assert not walls[b, gi, gj]
        spawn = tuple(np.floor(pos[b]).astype(int))
        assert not walls[b][spawn]
        assert (gi, gj) != spawn


def test_maze_rollout_steps():
    cfg = MazeConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.Env(Maze(cfg), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 16, 16)
    for a in [0, 2, 0, 3, 1]:
        res = env.step(state, jnp.full(8, a, jnp.int32))
        state = res.state
    assert np.isfinite(np.asarray(res.reward)).all()


def test_maze_config_validation():
    import pytest

    with pytest.raises(ValueError):
        MazeConfig(height_tile_map_tu=16)  # even
    with pytest.raises(ValueError):
        MazeConfig(height_tile_map_tu=3, width_tile_map_tu=3)  # too small
