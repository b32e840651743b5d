"""Top-view renderer tests: structure checks + oracle pixel parity."""

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw
from raycastworlds_tpu import colors
from raycastworlds_tpu.oracle.single_room import OracleSingleRoom


CFG = rcw.EnvConfig(num_rays=64, height_camera_view_pu=64, pu_per_tu=16)


def test_top_view_structure():
    game = rcw.SingleRoom(CFG)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(0))
    img = np.asarray(jax.jit(game.top_view_single)(state))
    assert img.shape == CFG.top_view_shape
    ppt = CFG.pu_per_tu
    # border wall tiles blitted white (interior of the tile away from
    # grid lines and any ray overdraw near the player side)
    assert img[ppt // 2, 2] in (colors.TILE_WALL, colors.RAY)
    # grid lines present
    assert (img[0, :] == colors.GRID_LINE).all() or (img[0, :] == colors.RAY).any()
    # goal tile blitted red at its center (unless a ray endpoint overdraws)
    gi, gj = np.asarray(state.goal_tu)
    center = img[gi * ppt + ppt // 2, gj * ppt + ppt // 2]
    assert center in (colors.TILE_GOAL, colors.RAY)
    # player circle present
    assert (img == colors.PLAYER).sum() > 0
    # rays present
    assert (img == colors.RAY).sum() > CFG.num_rays  # many ray pixels


def test_top_view_oracle_parity():
    game = rcw.SingleRoom(CFG)
    reset = jax.jit(game.reset_single)
    step = jax.jit(game.step_single)
    top = jax.jit(game.top_view_single)
    oracle = OracleSingleRoom(CFG)
    key = jax.random.PRNGKey(11)
    state = reset(key)
    oracle.reset(key)
    rng = np.random.RandomState(4)
    for t in range(40):
        if t % 8 == 0:
            img_j = np.asarray(top(state))
            img_o = oracle.top_view()
            np.testing.assert_array_equal(img_j, img_o, err_msg=f"step {t}")
        if bool(state.done):
            k = state.rng_key
            state = reset(k)
            oracle.reset(k)
        else:
            a = int(rng.choice(4, p=[0.5, 0.1, 0.2, 0.2]))
            state = step(state, jnp.int32(a))
            oracle.step(a)


def test_top_obs_types():
    for obs_type in ["top_u32", "top_rgb"]:
        cfg = rcw.EnvConfig(
            num_rays=16, height_camera_view_pu=16, pu_per_tu=8, obs_type=obs_type
        )
        env = rcw.Env(rcw.SingleRoom(cfg), num_envs=2)
        state, obs = env.reset(jax.random.PRNGKey(1))
        assert obs.shape == (2,) + cfg.obs_shape
        assert obs.dtype == env.observation_space.dtype
