"""Env API invariants (reset/step/auto-reset semantics).

Mirrors + extends the reference's only automated test
(/root/reference/test/runtests.jl): post-reset invariants, goal-reward
termination, plus batched invariants the reference cannot express.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.config import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT


@pytest.fixture(scope="module")
def env():
    cfg = rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)
    return rcw.Env(rcw.SingleRoom(cfg), num_envs=16)


@pytest.fixture(scope="module")
def reset_result(env):
    return env.reset(jax.random.PRNGKey(42))


def test_reset_invariants(env, reset_result):
    state, obs = reset_result
    cfg = env.cfg
    assert obs.shape == (16,) + cfg.obs_shape
    np.testing.assert_array_equal(np.asarray(state.reward), 0)
    np.testing.assert_array_equal(np.asarray(state.done), False)
    pos = np.asarray(state.pos_wu)
    # players at tile centers, inside the interior
    np.testing.assert_array_equal(pos % 1.0, 0.5)
    assert (pos[:, 0] >= 1.5).all() and (pos[:, 0] <= cfg.H - 1.5).all()
    goal = np.asarray(state.goal_tu)
    assert (goal >= 1).all()
    assert (goal[:, 0] <= cfg.H - 2).all() and (goal[:, 1] <= cfg.W - 2).all()
    # spawn tile is not the goal tile
    spawn = np.floor(pos).astype(int)
    assert (spawn != goal).any(axis=1).all()
    d = np.asarray(state.dir_au)
    assert ((d >= 0) & (d < cfg.num_directions)).all()


def test_turns_change_only_direction(env, reset_result):
    state, _ = reset_result
    res = env.step(state, jnp.full(16, TURN_LEFT, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(res.state.dir_au),
        (np.asarray(state.dir_au) + 1) % env.cfg.num_directions,
    )
    np.testing.assert_array_equal(np.asarray(res.state.pos_wu), np.asarray(state.pos_wu))
    np.testing.assert_array_equal(np.asarray(res.reward), 0)
    np.testing.assert_array_equal(np.asarray(res.done), False)
    back = env.step(res.state, jnp.full(16, TURN_RIGHT, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(back.state.dir_au), np.asarray(state.dir_au)
    )


def test_forward_moves_or_blocks(env, reset_result):
    state, _ = reset_result
    cfg = env.cfg
    res = env.step(state, jnp.full(16, MOVE_FORWARD, jnp.int32))
    pos0 = np.asarray(state.pos_wu)
    pos1 = np.asarray(res.state.pos_wu)
    moved = (pos0 != pos1).any(axis=1)
    done = np.asarray(res.done)
    lut = np.asarray(cfg.directions_wu)
    expected = pos0 + cfg.position_increment_wu * lut[np.asarray(state.dir_au)]
    for b in range(16):
        if done[b]:
            continue  # auto-reset already replaced the state
        if moved[b]:
            np.testing.assert_allclose(pos1[b], expected[b], rtol=1e-6)
        else:
            np.testing.assert_array_equal(pos1[b], pos0[b])


def test_goal_touch_rewards_and_terminates():
    """Place the player right next to the goal, facing it: one forward step
    must pay goal_reward, set done, and (reference rule, single_room.jl:166-168)
    not move the player — verified via auto_reset=False."""
    cfg = rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)
    game = rcw.SingleRoom(cfg)
    env = rcw.Env(game, num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # craft: goal at (4, 8); player just left of it facing +j (au = D/4)
    state = state.replace(
        goal_tu=jnp.array([[4, 8]], jnp.int32),
        pos_wu=jnp.array([[4.5, 7.8]], jnp.float32),
        dir_au=jnp.array([cfg.num_directions // 4], jnp.int32),
    )
    res = env.step(state, jnp.array([MOVE_FORWARD], jnp.int32))
    assert float(res.reward[0]) == cfg.goal_reward
    assert bool(res.done[0])
    np.testing.assert_array_equal(
        np.asarray(res.state.pos_wu[0]), np.array([4.5, 7.8], np.float32)
    )  # goal blocks entry


def test_auto_reset_replaces_terminated_envs():
    cfg = rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=1, auto_reset=True)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state.replace(
        goal_tu=jnp.array([[4, 8]], jnp.int32),
        pos_wu=jnp.array([[4.5, 7.8]], jnp.float32),
        dir_au=jnp.array([cfg.num_directions // 4], jnp.int32),
        t=jnp.array([7], jnp.int32),
    )
    res = env.step(state, jnp.array([MOVE_FORWARD], jnp.int32))
    assert bool(res.done[0]) and float(res.reward[0]) == 1.0
    assert int(res.info["terminal_t"][0]) == 8
    assert float(res.info["episode_return"][0]) == 1.0
    # fresh episode: t reset, pos at a tile center
    assert int(res.state.t[0]) == 0
    assert float(res.state.episode_return[0]) == 0.0
    pos = np.asarray(res.state.pos_wu[0])
    np.testing.assert_array_equal(pos % 1.0, 0.5)


def test_observation_types():
    for obs_type in ["camera_u32", "camera_rgb", "camera_gray", "depth", "tile_grid"]:
        cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16, obs_type=obs_type)
        env = rcw.Env(rcw.SingleRoom(cfg), num_envs=2)
        state, obs = env.reset(jax.random.PRNGKey(1))
        assert obs.shape == (2,) + cfg.obs_shape, obs_type
        assert obs.dtype == env.observation_space.dtype


def test_camera_view_colors_are_palette():
    cfg = rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=4)
    _, obs = env.reset(jax.random.PRNGKey(7))
    from raycastworlds_tpu import colors

    palette = {
        colors.CEILING, colors.FLOOR,
        colors.WALL_DIM_I, colors.WALL_DIM_J,
        colors.GOAL_DIM_I, colors.GOAL_DIM_J,
    }
    got = set(np.unique(np.asarray(obs)).tolist())
    assert got <= palette, got


def test_truncation_auto_resets():
    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, max_episode_steps=5
    )
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # force pure turning so no goal termination happens
    for t in range(5):
        res = env.step(state, jnp.full(4, TURN_LEFT, jnp.int32))
        state = res.state
    # the 5th step hits the limit: done via truncation, no reward
    assert np.asarray(res.done).all()
    np.testing.assert_array_equal(np.asarray(res.reward), 0.0)
    assert np.asarray(res.info["truncated"]).all()
    assert not np.asarray(res.info["terminated"]).any()
    # auto-reset happened: fresh episodes
    np.testing.assert_array_equal(np.asarray(res.state.t), 0)
    # and without the limit, no truncation occurs
    cfg2 = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    env2 = rcw.Env(rcw.SingleRoom(cfg2), num_envs=4)
    s2, _ = env2.reset(jax.random.PRNGKey(0))
    for t in range(6):
        r2 = env2.step(s2, jnp.full(4, TURN_LEFT, jnp.int32))
        s2 = r2.state
    assert not np.asarray(r2.done).any()
