"""1-byte observation forms: camera_pal8 (lossless palette index) and
camera_gray_u8 (quantized luma).

The pal8 guarantee is structural losslessness: decoding the uint8 palette
indices through colors.PALETTE reproduces the camera_u32 image bit-exactly,
for every family (including DynamicRoom's block colors and MultiPlayerRoom's
per-player views).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu import colors
from raycastworlds_tpu.ops import render


def _pair(game_cls, cfg):
    """(game_u32, game_pal8) with configs differing only in obs_type."""
    g32 = game_cls(dataclasses.replace(cfg, obs_type="camera_u32"))
    gp8 = game_cls(dataclasses.replace(cfg, obs_type="camera_pal8"))
    return g32, gp8


def _rollout_states(game, key, steps=20):
    state = jax.jit(game.reset_single)(key)
    step = jax.jit(game.step_single)
    states = [state]
    akey = key
    for t in range(steps):
        akey = jax.random.fold_in(akey, t)
        shape = getattr(game, "action_shape", ())
        a = jax.random.randint(akey, shape, 0, 4, dtype=jnp.int32)
        state = step(state, a)
        states.append(state)
    return states


FAMILY_CASES = [
    (rcw.SingleRoom, rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)),
    (
        rcw.MultiGoalRoom,
        rcw.MultiGoalConfig(num_rays=32, height_camera_view_pu=32, num_goals=3),
    ),
    (
        rcw.DynamicRoom,
        rcw.DynamicRoomConfig(
            num_rays=32, height_camera_view_pu=32, num_blocks=2
        ),
    ),
    (
        rcw.LockedRoom,
        rcw.LockedRoomConfig(num_rays=32, height_camera_view_pu=32),
    ),
    (
        rcw.Maze,
        rcw.MazeConfig(
            num_rays=32, height_camera_view_pu=32,
            height_tile_map_tu=9, width_tile_map_tu=9,
        ),
    ),
    (
        rcw.MultiPlayerRoom,
        rcw.MultiPlayerConfig(
            num_rays=32, height_camera_view_pu=32, num_players=2
        ),
    ),
]


@pytest.mark.parametrize(
    "game_cls,cfg", FAMILY_CASES, ids=[c[0].__name__ for c in FAMILY_CASES]
)
def test_pal8_decodes_to_u32_exactly(game_cls, cfg):
    g32, gp8 = _pair(game_cls, cfg)
    obs32 = jax.jit(jax.vmap(g32.observe_single))
    obs8 = jax.jit(jax.vmap(gp8.observe_single))
    for seed in (0, 1):
        states = _rollout_states(g32, jax.random.PRNGKey(seed))
        batch = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states
        )
        a = np.asarray(obs32(batch))
        b = np.asarray(obs8(batch))
        assert b.dtype == np.uint8
        assert b.shape == a.shape
        np.testing.assert_array_equal(colors.pal8_to_u32_np(b), a)


def test_pal8_device_decode_matches_host():
    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, obs_type="camera_pal8"
    )
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=2)
    state, obs = env.reset(jax.random.PRNGKey(3))
    dev = np.asarray(jax.jit(render.pal8_to_u32)(obs))
    np.testing.assert_array_equal(dev, colors.pal8_to_u32_np(np.asarray(obs)))


def test_gray_u8_matches_float_luma():
    cfg32 = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    cfg8 = dataclasses.replace(cfg32, obs_type="camera_gray_u8")
    g32 = rcw.SingleRoom(cfg32)
    g8 = rcw.SingleRoom(cfg8)
    state = jax.jit(g32.reset_single)(jax.random.PRNGKey(4))
    img = np.asarray(jax.jit(g32.observe_single)(state)).astype(np.uint32)
    got = np.asarray(jax.jit(g8.observe_single)(state))
    assert got.dtype == np.uint8
    r = ((img >> 16) & 0xFF).astype(np.float32)
    g = ((img >> 8) & 0xFF).astype(np.float32)
    b = (img & 0xFF).astype(np.float32)
    want = (
        np.float32(0.299) * r + np.float32(0.587) * g + np.float32(0.114) * b
        + np.float32(0.5)
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_env_spaces_and_shapes():
    for obs_type in ("camera_pal8", "camera_gray_u8"):
        cfg = rcw.EnvConfig(
            num_rays=16, height_camera_view_pu=16, obs_type=obs_type
        )
        env = rcw.Env(rcw.SingleRoom(cfg), num_envs=2)
        assert env.observation_space.dtype == jnp.uint8
        state, obs = env.reset(jax.random.PRNGKey(5))
        assert obs.shape == (2, 16, 16) and obs.dtype == jnp.uint8
        res = env.step(state, jnp.zeros(2, jnp.int32))
        assert res.obs.dtype == jnp.uint8


@pytest.mark.parametrize("texture", ["checker", "brick", "xor"])
def test_pal8_textured_decodes_to_u32_exactly(texture):
    """Textured pal8 (round 5): the extended slab x factor palette decodes
    bit-exactly to the textured camera_u32 render — the texture factor sets
    are finite, so 'continuous shading' still fits a u8 index."""
    base = rcw.EnvConfig(
        num_rays=32, height_camera_view_pu=32,
        wall_texture=texture, texture_cells=8,
    )
    g32, gp8 = _pair(rcw.SingleRoom, base)
    obs32 = jax.jit(jax.vmap(g32.observe_single))
    obs8 = jax.jit(jax.vmap(gp8.observe_single))
    pal = gp8.cfg.palette_np
    assert len(pal) == 12 + 6 * len(
        colors.texture_factors(texture, 8)
    )
    for seed in (0, 1):
        states = _rollout_states(g32, jax.random.PRNGKey(seed))
        batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        a = np.asarray(obs32(batch))
        b = np.asarray(obs8(batch))
        assert b.dtype == np.uint8
        np.testing.assert_array_equal(colors.pal8_to_u32_np(b, pal), a)


def test_pal8_textured_dynamic_room_blocks():
    """Block slab colors (DynamicRoom) take the textured palette too."""
    cfg = rcw.DynamicRoomConfig(
        num_rays=32, height_camera_view_pu=32, num_blocks=2,
        wall_texture="checker",
    )
    g32, gp8 = _pair(rcw.DynamicRoom, cfg)
    states = _rollout_states(g32, jax.random.PRNGKey(2), steps=10)
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    a = np.asarray(jax.jit(jax.vmap(g32.observe_single))(batch))
    b = np.asarray(jax.jit(jax.vmap(gp8.observe_single))(batch))
    np.testing.assert_array_equal(
        colors.pal8_to_u32_np(b, gp8.cfg.palette_np), a
    )


def test_pal8_xor_texture_cells_bound():
    # xor with more gradient levels than the palette can hold is rejected
    with pytest.raises(ValueError, match="texture_cells"):
        rcw.EnvConfig(
            obs_type="camera_pal8", wall_texture="xor", texture_cells=64
        )
    # checker/brick always fit, any texture_cells
    rcw.EnvConfig(
        obs_type="camera_pal8", wall_texture="brick", texture_cells=64
    )


def test_pal8_textured_ppo_preprocess_matches_u32():
    from raycastworlds_tpu.parallel.ppo import preprocess_obs

    cfg32 = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, wall_texture="xor",
        texture_cells=4,
    )
    cfg8 = dataclasses.replace(cfg32, obs_type="camera_pal8")
    g32 = rcw.SingleRoom(cfg32)
    g8 = rcw.SingleRoom(cfg8)
    state = jax.jit(g32.reset_single)(jax.random.PRNGKey(6))
    f32 = preprocess_obs(cfg32, jax.jit(g32.observe_single)(state)[None])
    f8 = preprocess_obs(cfg8, jax.jit(g8.observe_single)(state)[None])
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f32), atol=1e-6)


def test_palette_is_frozen_and_distinct():
    # every render constant is in the palette; indices are stable
    assert len(set(colors.PALETTE)) == len(colors.PALETTE) == 12
    for c in (
        colors.CEILING, colors.FLOOR, colors.WALL_DIM_I, colors.WALL_DIM_J,
        colors.GOAL_DIM_I, colors.GOAL_DIM_J, colors.BLOCK_DIM_I,
        colors.BLOCK_DIM_J, colors.TILE_WALL, colors.TILE_GOAL,
        colors.TILE_EMPTY, colors.TILE_BLOCK, colors.RAY, colors.PLAYER,
        colors.GRID_LINE,
    ):
        assert c in colors.PALETTE
    assert colors.PALETTE[colors.PAL_CEILING] == colors.CEILING
    assert colors.PALETTE[colors.PAL_FLOOR] == colors.FLOOR


def test_ppo_preprocess_matches_u32_features():
    from raycastworlds_tpu.parallel.ppo import preprocess_obs

    cfg32 = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    cfg8 = dataclasses.replace(cfg32, obs_type="camera_pal8")
    g32 = rcw.SingleRoom(cfg32)
    g8 = rcw.SingleRoom(cfg8)
    state = jax.jit(g32.reset_single)(jax.random.PRNGKey(6))
    f32 = preprocess_obs(cfg32, jax.jit(g32.observe_single)(state)[None])
    f8 = preprocess_obs(cfg8, jax.jit(g8.observe_single)(state)[None])
    assert f8.shape == f32.shape
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f32), atol=1e-6)


def test_ppo_trains_on_pal8():
    from raycastworlds_tpu.parallel.ppo import PPOConfig, PPOTrainer

    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, obs_type="camera_pal8"
    )
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=8)
    trainer = PPOTrainer(env, PPOConfig(rollout_steps=4, num_minibatches=2))
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
