"""MultiPlayerRoom: P simultaneous players, shared goal, cross-visibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu import colors
from raycastworlds_tpu.config import MOVE_FORWARD, TURN_LEFT


CFG = rcw.MultiPlayerConfig(
    num_players=3, num_rays=24, height_camera_view_pu=24
)


def test_reset_distinct_interior_spawns():
    game = rcw.MultiPlayerRoom(CFG)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(0))
    pos = np.asarray(state.pos_wu)
    assert pos.shape == (3, 2)
    tiles = np.floor(pos).astype(int)
    # distinct tiles, all interior, none on the goal
    assert len({tuple(t) for t in tiles}) == 3
    assert (tiles >= 1).all()
    assert (tiles[:, 0] <= CFG.H - 2).all() and (tiles[:, 1] <= CFG.W - 2).all()
    goal = np.asarray(state.goal_tu)
    assert not any((t == goal).all() for t in tiles)
    assert np.asarray(state.reward).shape == (3,)


def test_env_shapes_and_rollout():
    env = rcw.Env(rcw.MultiPlayerRoom(CFG), num_envs=4)
    assert env.observation_space.shape == (3, 24, 24)
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (4, 3, 24, 24)
    a = env.sample_action(jax.random.PRNGKey(2))
    assert a.shape == (4, 3)
    res = env.step(state, a)
    assert res.reward.shape == (4, 3)
    assert res.done.shape == (4,)
    # deterministic under fixed seeds
    res2 = env.step(state, a)
    np.testing.assert_array_equal(np.asarray(res.obs), np.asarray(res2.obs))


def test_goal_scoring_terminates_and_pays_scorer_only():
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16
    )
    env = rcw.Env(rcw.MultiPlayerRoom(cfg), num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(3))
    g = np.asarray(state.goal_tu[0])
    # park player 0 adjacent to the goal facing it; player 1 far away
    pos = np.asarray(state.pos_wu[0]).copy()
    pos[0] = [g[0] + 1.5, g[1] + 0.5]
    pos[1] = [1.5, 1.5] if not np.allclose([1.5, 1.5], pos[0]) else [2.5, 1.5]
    state = state.replace(
        pos_wu=jnp.asarray(pos[None], jnp.float32),
        dir_au=jnp.asarray([[cfg.num_directions // 2, 0]], jnp.int32),
    )
    reward = np.zeros(2, np.float32)
    for _ in range(6):
        res = env.step(
            state, jnp.asarray([[MOVE_FORWARD, TURN_LEFT]], jnp.int32)
        )
        state = res.state
        reward = np.asarray(res.reward[0])
        if res.done[0]:
            break
    assert bool(res.done[0])
    assert reward[0] == 1.0 and reward[1] == 0.0
    # scorer did not enter the goal tile (goal-blocks-entry per player)
    tile0 = np.floor(np.asarray(state.pos_wu[0, 0])).astype(int)
    assert not (tile0 == g).all()


def test_player_collision_blocks():
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16,
    )
    game = rcw.MultiPlayerRoom(cfg)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(4))
    # put the players 2 tiles apart on a row, facing each other
    state = state.replace(
        pos_wu=jnp.asarray([[2.5, 2.5], [2.5, 4.5]], jnp.float32),
        dir_au=jnp.asarray([cfg.num_directions // 4 * 0, 0], jnp.int32),
        goal_tu=jnp.asarray([5, 10], jnp.int32),
    )
    # heading 0 = +x (i axis); make p0 face +j instead: use au = quarter turn
    q = cfg.num_directions // 4
    state = state.replace(dir_au=jnp.asarray([q, -q % cfg.num_directions], jnp.int32))
    step = jax.jit(game.step_single)
    # march p0 toward p1 (p1 turns in place): blocked before overlap
    for _ in range(40):
        state = step(state, jnp.asarray([MOVE_FORWARD, TURN_LEFT], jnp.int32))
    d = float(jnp.linalg.norm(state.pos_wu[0] - state.pos_wu[1]))
    assert d >= 2 * cfg.player_radius_wu - 1e-6
    # with collision off they can overlap
    cfg2 = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16,
        player_collision=False,
    )
    game2 = rcw.MultiPlayerRoom(cfg2)
    state2 = state.replace(
        pos_wu=jnp.asarray([[2.5, 2.5], [2.5, 4.5]], jnp.float32),
        dir_au=jnp.asarray([q, 0], jnp.int32),
    )
    step2 = jax.jit(game2.step_single)
    for _ in range(40):
        state2 = step2(state2, jnp.asarray([MOVE_FORWARD, TURN_LEFT], jnp.int32))
    # p0 marched straight through p1's position and beyond
    assert float(state2.pos_wu[0, 1]) > float(state2.pos_wu[1, 1])


def test_converging_candidates_lower_index_wins():
    """Two players converging on the same point in one step: without the
    candidate-vs-candidate test both would pass (each candidate clears the
    other's CURRENT circle) and interpenetrate; the deterministic rule is
    that the lower index moves and the higher is blocked."""
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16,
    )
    game = rcw.MultiPlayerRoom(cfg)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(7))
    q = cfg.num_directions // 4
    # 0.4 wu apart on a j-row, facing each other; one forward step of 0.125
    # puts the candidates 0.15 < 2r = 0.25 apart while each candidate stays
    # 0.275 >= 2r from the other's current position.
    state = state.replace(
        pos_wu=jnp.asarray([[2.5, 2.3], [2.5, 2.7]], jnp.float32),
        dir_au=jnp.asarray([q, 3 * q], jnp.int32),
        goal_tu=jnp.asarray([5, 10], jnp.int32),
    )
    out = jax.jit(game.step_single)(
        state, jnp.asarray([MOVE_FORWARD, MOVE_FORWARD], jnp.int32)
    )
    pos = np.asarray(out.pos_wu)
    np.testing.assert_allclose(pos[0], [2.5, 2.425], atol=1e-6)  # moved
    np.testing.assert_allclose(pos[1], [2.5, 2.7], atol=1e-6)    # blocked
    assert np.linalg.norm(pos[0] - pos[1]) >= 2 * cfg.player_radius_wu - 1e-6


_VIS_STATE = dict(
    pos_wu=[[4.5, 2.5], [4.5, 6.5]],  # p1 directly ahead of p0 (+j)
    goal_tu=[1, 13],
)


def _vis_cfg(**kw):
    return rcw.MultiPlayerConfig(
        num_players=2, num_rays=32, height_camera_view_pu=32,
        height_tile_map_tu=8, width_tile_map_tu=16, **kw,
    )


def _vis_frame(cfg):
    game = rcw.MultiPlayerRoom(cfg)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(5))
    q = cfg.num_directions // 4
    state = state.replace(
        pos_wu=jnp.asarray(_VIS_STATE["pos_wu"], jnp.float32),
        dir_au=jnp.asarray([q, 0], jnp.int32),
        goal_tu=jnp.asarray(_VIS_STATE["goal_tu"], jnp.int32),
    )
    return np.asarray(jax.jit(game.observe_single)(state)[0])


def test_other_players_visible_as_sprites():
    """Default render: the other player appears as a TILE_BLOCK-blue
    billboard sprite at its actual position, standing on the floor (floor
    pixels below it) and narrower than a whole tile."""
    frame = _vis_frame(_vis_cfg())
    present = set(np.unique(frame).tolist())
    assert colors.TILE_BLOCK in present
    assert not (present & {colors.BLOCK_DIM_I, colors.BLOCK_DIM_J})
    sprite_cols = np.unique(np.where(frame == colors.TILE_BLOCK)[1])
    # sub-tile: the sprite (0.25 wu circle at 4 wu) spans a narrow column
    # band, not the ~quarter-frame a whole tile would
    assert 0 < len(sprite_cols) < frame.shape[1] // 4
    # floor-standing: pixels directly below the sprite are floor-colored
    c = int(sprite_cols[len(sprite_cols) // 2])
    rows = np.where(frame[:, c] == colors.TILE_BLOCK)[0]
    assert frame[rows.max() + 1, c] == colors.FLOOR


def test_sprite_subtile_position_moves_the_sprite():
    """Moving the other player by half a tile moves the sprite columns —
    the round-3 block approximation could not show sub-tile offsets."""
    f1 = _vis_frame(_vis_cfg())
    global _VIS_STATE
    saved = _VIS_STATE
    _VIS_STATE = dict(pos_wu=[[4.5, 2.5], [4.1, 6.9]], goal_tu=[1, 13])
    try:
        f2 = _vis_frame(_vis_cfg())
    finally:
        _VIS_STATE = saved
    c1 = np.unique(np.where(f1 == colors.TILE_BLOCK)[1])
    c2 = np.unique(np.where(f2 == colors.TILE_BLOCK)[1])
    assert len(c1) and len(c2) and set(c1) != set(c2)


def test_other_players_visible_as_blocks():
    """player_render='block' keeps the round-3 tile-resolution path."""
    frame = _vis_frame(_vis_cfg(player_render="block"))
    present = set(np.unique(frame).tolist())
    assert present & {colors.BLOCK_DIM_I, colors.BLOCK_DIM_J}
    # invisible mode: neither sprites nor block colors
    frame2 = _vis_frame(_vis_cfg(players_visible=False))
    present2 = set(np.unique(frame2).tolist())
    assert not (present2 & {
        colors.BLOCK_DIM_I, colors.BLOCK_DIM_J, colors.TILE_BLOCK,
    })


def test_auto_reset_and_truncation():
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16,
        max_episode_steps=5,
    )
    env = rcw.Env(rcw.MultiPlayerRoom(cfg), num_envs=3)
    state, _ = env.reset(jax.random.PRNGKey(6))
    for t in range(5):
        res = env.step(
            state, jnp.full((3, 2), TURN_LEFT, jnp.int32)
        )
        state = res.state
    assert bool(np.all(np.asarray(res.done)))          # truncated at t=5
    assert int(np.max(np.asarray(state.t))) == 0        # auto-reset happened


def test_bad_config_raises():
    with pytest.raises(ValueError, match="num_players"):
        rcw.MultiPlayerConfig(num_players=0)


def test_gym_adapter_rejects_multi_player():
    with pytest.raises(ValueError, match="single-agent"):
        rcw.GymAdapter(rcw.MultiPlayerRoom(CFG))
