"""Fused Pallas DDA+render kernel: bit-equality with the scan+XLA path.

The fused kernel (ops/render_fused.py) replays the exact float32 operation
sequence of raycast.cast_rays_scan followed by render.render_camera_u32
(both parity-pinned to the NumPy/C++ oracles), so its output must be
bit-identical — for every world family it supports, every camera obs type,
and across the auto-reset step loop.  Runs in Pallas interpreter mode on the
CPU backend (conftest), compiled Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu import config as cfg_mod


def _pair(game_cls, cfg_cls, **kw):
    cfg_scan = cfg_cls(raycast_backend="scan", **kw)
    cfg_fused = cfg_mod.replace(cfg_scan, raycast_backend="fused")
    return game_cls(cfg_scan), game_cls(cfg_fused)


FAMILIES = [
    (rcw.SingleRoom, rcw.EnvConfig, {}),
    (rcw.RandomRoom, rcw.RandomRoomConfig,
     dict(height_tile_map_tu=16, width_tile_map_tu=16)),
    (rcw.Maze, rcw.MazeConfig,
     dict(height_tile_map_tu=9, width_tile_map_tu=9)),
    (rcw.MultiGoalRoom, rcw.MultiGoalConfig, {}),
    (rcw.DynamicRoom, rcw.DynamicRoomConfig, {}),
]


@pytest.mark.parametrize("game_cls,cfg_cls,kw", FAMILIES,
                         ids=[f[0].__name__ for f in FAMILIES])
def test_fused_bit_equal_per_family(game_cls, cfg_cls, kw):
    g_scan, g_fused = _pair(
        game_cls, cfg_cls, num_rays=32, height_camera_view_pu=16, **kw
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    state = jax.jit(jax.vmap(g_scan.reset_single))(keys)
    obs_scan = jax.jit(g_scan.observe_batch)(state)
    obs_fused = jax.jit(g_fused.observe_batch)(state)
    np.testing.assert_array_equal(np.asarray(obs_scan), np.asarray(obs_fused))


@pytest.mark.parametrize("obs_type", ["camera_u32", "camera_rgb", "camera_gray"])
def test_fused_obs_types(obs_type):
    g_scan, g_fused = _pair(
        rcw.SingleRoom, rcw.EnvConfig,
        num_rays=32, height_camera_view_pu=16, obs_type=obs_type,
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    state = jax.jit(jax.vmap(g_scan.reset_single))(keys)
    a = np.asarray(jax.jit(g_scan.observe_batch)(state))
    b = np.asarray(jax.jit(g_fused.observe_batch)(state))
    np.testing.assert_array_equal(a, b)


def test_fused_through_env_rollout():
    # Full Env step loop (auto-reset included) agrees step-for-step.
    def run(backend):
        cfg = rcw.EnvConfig(
            num_rays=32, height_camera_view_pu=16, raycast_backend=backend
        )
        env = rcw.Env(rcw.SingleRoom(cfg), num_envs=8)
        state, obs = env.reset(jax.random.PRNGKey(11))
        frames = [np.asarray(obs)]
        key = jax.random.PRNGKey(12)
        for t in range(20):
            key, k = jax.random.split(key)
            acts = jax.random.randint(k, (8,), 0, 4)
            res = env.step(state, acts)
            state = res.state
            frames.append(np.asarray(res.obs))
        return frames

    fa = run("scan")
    fb = run("fused")
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


def test_fused_odd_batch_blocking():
    # Batch sizes that don't divide the default env block still work.
    g_scan, g_fused = _pair(
        rcw.SingleRoom, rcw.EnvConfig, num_rays=32, height_camera_view_pu=16
    )
    keys = jax.random.split(jax.random.PRNGKey(9), 13)
    state = jax.jit(jax.vmap(g_scan.reset_single))(keys)
    a = np.asarray(jax.jit(g_scan.observe_batch)(state))
    b = np.asarray(jax.jit(g_fused.observe_batch)(state))
    np.testing.assert_array_equal(a, b)


def test_fused_texture_falls_back_to_scan():
    # Textured walls aren't in the kernel yet; the fused config must still
    # produce the textured (scan-path) image, not silently drop the texture.
    cfg_scan = rcw.EnvConfig(
        num_rays=32, height_camera_view_pu=16,
        raycast_backend="scan", wall_texture="checker",
    )
    cfg_fused = cfg_mod.replace(cfg_scan, raycast_backend="fused")
    g_scan = rcw.SingleRoom(cfg_scan)
    g_fused = rcw.SingleRoom(cfg_fused)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    state = jax.jit(jax.vmap(g_scan.reset_single))(keys)
    a = np.asarray(jax.jit(g_scan.observe_batch)(state))
    b = np.asarray(jax.jit(g_fused.observe_batch)(state))
    np.testing.assert_array_equal(a, b)
