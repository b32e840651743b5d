"""MultiGoalRoom (K collectable goals) and DynamicRoom (moving obstacle
blocks) family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.models.dynamic_room import DynamicRoom, DynamicRoomConfig
from raycastworlds_tpu.models.multi_goal import MultiGoalConfig, MultiGoalRoom
from raycastworlds_tpu.ops import bitmap


def _mg_cfg(**kw):
    kw.setdefault("num_rays", 16)
    kw.setdefault("height_camera_view_pu", 16)
    return MultiGoalConfig(**kw)


def _dyn_cfg(**kw):
    kw.setdefault("num_rays", 16)
    kw.setdefault("height_camera_view_pu", 16)
    return DynamicRoomConfig(**kw)


def goal_tiles(state, b=None):
    """Dense goal mask from the packed goal words."""
    words = state.goal_words if b is None else state.goal_words[b]
    return np.asarray(bitmap.unpack_bits(words, state.hw))


def test_multigoal_reset_invariants():
    cfg = _mg_cfg(num_goals=5)
    game = MultiGoalRoom(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    state = jax.jit(jax.vmap(game.reset_single))(keys)
    walls = np.asarray(state.wall_map)
    for b in range(32):
        goals = goal_tiles(state, b)
        assert goals.sum() == 5, "exactly num_goals goal tiles"
        assert not (goals & walls[b]).any(), "goals on empty tiles"
        spawn = tuple(np.floor(np.asarray(state.pos_wu[b])).astype(int))
        assert not goals[spawn], "spawn not on a goal"
        assert not walls[b][spawn]


def test_multigoal_collects_and_terminates():
    cfg = _mg_cfg(num_goals=2, collect_all=True)
    game = MultiGoalRoom(cfg)
    env = rcw.Env(game, num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))

    # Plant the two goals point-blank ahead of the player, one behind the
    # other, and walk into them.
    goal_map = jnp.zeros((cfg.H, cfg.W), bool).at[2, 5].set(True).at[2, 7].set(True)
    state = state.replace(
        goal_words=bitmap.pack_bits(goal_map)[None],
        pos_wu=jnp.asarray([[2.5, 4.8]]),
        dir_au=jnp.zeros((1,), jnp.int32) + cfg.num_directions // 4,  # +y
    )
    fwd = jnp.zeros(1, jnp.int32)
    r1 = env.step(state, fwd)
    # first goal collected: +reward, not done, goal bit cleared, no movement
    assert float(r1.reward[0]) == pytest.approx(cfg.goal_reward)
    assert not bool(r1.done[0])
    assert goal_tiles(r1.state, 0).sum() == 1
    np.testing.assert_allclose(np.asarray(r1.state.pos_wu[0]), [2.5, 4.8])

    # walk to the second goal (two tiles ahead): free moves then collect
    state = r1.state
    for _ in range(32):
        res = env.step(state, fwd)
        state = res.state
        if bool(res.done[0]):
            break
    assert bool(res.done[0]), "episode ends when all goals collected"
    assert float(res.reward[0]) == pytest.approx(cfg.goal_reward)
    assert goal_tiles(state, 0).sum() == 0


def test_multigoal_terminate_mode():
    cfg = _mg_cfg(num_goals=3, collect_all=False)
    env = rcw.Env(MultiGoalRoom(cfg), num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(1))
    goal_map = jnp.zeros((cfg.H, cfg.W), bool).at[2, 5].set(True).at[4, 5].set(True).at[5, 9].set(True)
    state = state.replace(
        goal_words=bitmap.pack_bits(goal_map)[None],
        pos_wu=jnp.asarray([[2.5, 4.8]]),
        dir_au=jnp.zeros((1,), jnp.int32) + cfg.num_directions // 4,
    )
    res = env.step(state, jnp.zeros(1, jnp.int32))
    assert bool(res.done[0]), "first touch terminates"
    assert float(res.reward[0]) == pytest.approx(cfg.goal_reward)


def test_multigoal_rollout_and_obs_shapes():
    cfg = _mg_cfg(num_goals=4)
    env = rcw.Env(MultiGoalRoom(cfg), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 16, 16)
    key = jax.random.PRNGKey(1)
    for _ in range(20):
        key, k = jax.random.split(key)
        res = env.step(state, env.sample_action(k))
        state = res.state
    assert np.isfinite(np.asarray(res.reward)).all()
    # goal counts never exceed num_goals and stay >= 1 post-auto-reset
    counts = np.asarray(
        jax.vmap(lambda wds: jnp.sum(jax.lax.population_count(wds)))(
            state.goal_words
        )
    )
    assert (counts >= 1).all() and (counts <= 4).all()


def test_multigoal_topview_marks_all_goals():
    cfg = _mg_cfg(num_goals=3, pu_per_tu=4)
    game = MultiGoalRoom(cfg)
    state = game.reset_single(jax.random.PRNGKey(5))
    img = np.asarray(game.top_view_single(state))
    goals = goal_tiles(state)
    red = (img == rcw.colors.TILE_GOAL)
    ppt = 4
    for (gi, gj) in np.argwhere(goals):
        tile_px = red[gi * ppt:(gi + 1) * ppt, gj * ppt:(gj + 1) * ppt]
        assert tile_px.any(), f"goal tile ({gi},{gj}) not drawn red"


def test_dynamic_reset_invariants():
    cfg = _dyn_cfg(num_blocks=4)
    game = DynamicRoom(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    state = jax.jit(jax.vmap(game.reset_single))(keys)
    walls = np.asarray(state.wall_map)
    blocks = np.asarray(state.blocks)
    goal = np.asarray(state.goal_tu)
    for b in range(32):
        tiles = {tuple(t) for t in blocks[b, :, :2]}
        assert len(tiles) == 4, "distinct block tiles"
        for (i, j) in tiles:
            assert not walls[b, i, j]
            assert (i, j) != tuple(goal[b])
        assert (blocks[b, :, 2] >= 0).all() and (blocks[b, :, 2] <= 3).all()


def test_dynamic_blocks_move_and_bounce():
    cfg = _dyn_cfg(num_blocks=1, block_period=1, height_tile_map_tu=8,
                   width_tile_map_tu=8)
    game = DynamicRoom(cfg)
    env = rcw.Env(game, num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # pin the world: block at (3, 5) heading east (dir 3), wall at column 7;
    # player far away, goal far away
    state = state.replace(
        blocks=jnp.asarray([[[3, 5, 3]]], jnp.int32),
        goal_tu=jnp.asarray([[6, 1]], jnp.int32),
        pos_wu=jnp.asarray([[1.5, 1.5]]),
    )
    noop = jnp.full(1, 2, jnp.int32)  # turn action; player stays put
    seen = []
    for _ in range(5):
        res = env.step(state, noop)
        state = res.state
        seen.append(tuple(np.asarray(state.blocks[0, 0])))
    # east until the border wall at j=7 blocks (tile 6 is the last free), then
    # bounce west
    assert seen[0][:2] == (3, 6)
    assert seen[1][:2] == (3, 6) and seen[1][2] == 2  # bounced, now west
    assert seen[2][:2] == (3, 5)
    assert seen[3][:2] == (3, 4)


def test_dynamic_block_blocks_player():
    cfg = _dyn_cfg(num_blocks=1, block_period=1000000)
    env = rcw.Env(DynamicRoom(cfg), num_envs=1, auto_reset=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state.replace(
        blocks=jnp.asarray([[[2, 6, 0]]], jnp.int32),
        goal_tu=jnp.asarray([[5, 12]], jnp.int32),
        pos_wu=jnp.asarray([[2.5, 5.8]]),
        dir_au=jnp.zeros((1,), jnp.int32) + cfg.num_directions // 4,  # +y
    )
    res = env.step(state, jnp.zeros(1, jnp.int32))
    # walking into the block: no movement, no reward, not done
    np.testing.assert_allclose(np.asarray(res.state.pos_wu[0]), [2.5, 5.8])
    assert float(res.reward[0]) == 0.0
    assert not bool(res.done[0])


def test_dynamic_blocks_visible_in_camera():
    cfg = _dyn_cfg(num_blocks=1, block_period=1000000,
                   height_camera_view_pu=32, num_rays=32)
    game = DynamicRoom(cfg)
    state = game.reset_single(jax.random.PRNGKey(0))
    state = state.replace(
        blocks=jnp.asarray([[2, 6, 0]], jnp.int32),
        goal_tu=jnp.asarray([5, 12], jnp.int32),
        pos_wu=jnp.asarray([2.5, 4.5]),
        dir_au=jnp.asarray(cfg.num_directions // 4, jnp.int32),  # facing +y
    )
    img = np.asarray(game.camera_view_single(state))
    block_px = np.isin(
        img, [rcw.colors.BLOCK_DIM_I, rcw.colors.BLOCK_DIM_J]
    ).sum()
    assert block_px > 0, "block must be visible dead ahead"


def test_dynamic_rollout_with_autoreset():
    cfg = _dyn_cfg(num_blocks=3, block_period=2)
    env = rcw.Env(DynamicRoom(cfg), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 16, 16)
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, k = jax.random.split(key)
        res = env.step(state, env.sample_action(k))
        state = res.state
    blocks = np.asarray(state.blocks)
    walls = np.asarray(state.wall_map)
    for b in range(8):
        for (i, j, d) in blocks[b]:
            assert not walls[b, i, j], "blocks never end up inside walls"
            assert 0 <= d <= 3


def test_config_validation():
    with pytest.raises(ValueError):
        _mg_cfg(num_goals=0)
    with pytest.raises(ValueError):
        _dyn_cfg(block_period=0)


def _agree(game_scan, game_ana, key, steps=12):
    """Analytic box raycaster must agree with the scan DDA on hit tiles and
    faces (distances to float32 rounding) along a shared trajectory.

    Exception: rays crossing a wall face exactly on a tile gridline are
    rounding-ambiguous (the one-shot (face-origin)/dir division vs the DDA's
    accumulated sides can land on either side of the corner); those may
    differ by one tile along the cross axis at identical distance."""
    state = game_scan.reset_single(key)
    k = key
    for i in range(steps):
        h_scan = game_scan.cast_single(state)
        h_ana = game_ana.cast_single(state)
        ts = np.asarray(h_scan.hit_tu)
        ta = np.asarray(h_ana.hit_tu)
        np.testing.assert_array_equal(
            np.asarray(h_scan.hit_dim), np.asarray(h_ana.hit_dim)
        )
        np.testing.assert_allclose(
            np.asarray(h_scan.dist_wu), np.asarray(h_ana.dist_wu),
            rtol=2e-6, atol=2e-6,
        )
        bad = np.where((ts != ta).any(axis=1))[0]
        for r in bad:
            dim = int(h_scan.hit_dim[r])
            cross = 1 - dim
            assert ts[r][dim] == ta[r][dim], (r, ts[r], ta[r])
            assert abs(int(ts[r][cross]) - int(ta[r][cross])) == 1, (
                r, ts[r], ta[r],
            )
            # must be a gridline-coincident crossing
            c = float(state.pos_wu[cross]) + float(h_scan.dist_wu[r]) * float(
                h_scan.ray_dirs[r][cross]
            )
            assert abs(c - round(c)) < 1e-4, (r, c)
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (), 0, 4)
        state = game_scan.step_single(state, a)


def test_multigoal_analytic_matches_scan():
    import dataclasses

    cfg_s = _mg_cfg(num_goals=4, raycast_backend="scan")
    cfg_a = dataclasses.replace(cfg_s, raycast_backend="analytic")
    for seed in range(4):
        _agree(
            MultiGoalRoom(cfg_s), MultiGoalRoom(cfg_a),
            jax.random.PRNGKey(seed),
        )


def test_multigoal_analytic_ignores_collected_goals():
    import dataclasses

    cfg = _mg_cfg(num_goals=2, raycast_backend="analytic")
    game = MultiGoalRoom(cfg)
    state = game.reset_single(jax.random.PRNGKey(0))
    # collect goal 0 by hand: clear its bit and disable its tile row
    g0 = state.goal_tiles[0]
    idx = g0[0] * cfg.W + g0[1]
    cleared = state.goal_words & ~jnp.where(
        jnp.arange(state.goal_words.shape[0]) == (idx >> 5),
        jnp.uint32(1) << (idx & 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    state = state.replace(
        goal_words=cleared,
        goal_tiles=state.goal_tiles.at[0].set(jnp.array([-1, -1])),
    )
    cfg_s = dataclasses.replace(cfg, raycast_backend="scan")
    h_ana = game.cast_single(state)
    h_scan = MultiGoalRoom(cfg_s).cast_single(state)
    np.testing.assert_array_equal(
        np.asarray(h_scan.hit_tu), np.asarray(h_ana.hit_tu)
    )


def test_dynamic_analytic_matches_scan():
    import dataclasses

    cfg_s = _dyn_cfg(num_blocks=3, block_period=2, raycast_backend="scan")
    cfg_a = dataclasses.replace(cfg_s, raycast_backend="analytic")
    for seed in range(4):
        _agree(
            DynamicRoom(cfg_s), DynamicRoom(cfg_a), jax.random.PRNGKey(seed)
        )
