"""Parity and agreement tests for the loop-free 'crossing' raycast backend.

The crossing backend (ops/raycast.cast_rays_crossing) reformulates the
sequential DDA march as a parallel min over all grid-line crossings.  It has
its own scalar-oracle mode (oracle/single_room.py cast_one_crossing — same
float32 expressions), so parity is pinned the same way as the scan backend:
fixed-seed trajectories and pixel-exact camera views vs the independent
NumPy implementation.  Against the sequential scan it must agree on hit
tiles and hit dimensions everywhere (distances may differ by ~1 ulp:
closed-form ``side0 + k*delta`` vs accumulated sides).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.ops import bitmap, raycast
from raycastworlds_tpu.oracle.families import OracleWorld


def test_crossing_matches_scan_on_random_maps():
    rng = np.random.RandomState(0)
    total = 0
    for _ in range(60):
        h, w = rng.randint(5, 18), rng.randint(5, 18)
        m = rng.rand(h, w) < 0.25
        m[0] = m[-1] = True
        m[:, 0] = m[:, -1] = True
        free = np.argwhere(~m)
        if len(free) == 0:
            continue
        ti, tj = free[rng.randint(len(free))]
        px = ti + rng.rand() * 0.98 + 0.01
        py = tj + rng.rand() * 0.98 + 0.01
        ang = rng.rand(16) * 2 * np.pi
        dirs = jnp.asarray(
            np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
        )
        words = jnp.asarray(bitmap.pack_bits_np(m))
        pos = jnp.asarray([px, py], jnp.float32)
        ht1, hd1, d1 = jax.jit(
            lambda wo, p, d: raycast.cast_rays_scan(wo, (h, w), p, d, h + w)
        )(words, pos, dirs)
        ht2, hd2, d2 = jax.jit(
            lambda wo, p, d: raycast.cast_rays_crossing(wo, (h, w), p, d)
        )(words, pos, dirs)
        np.testing.assert_array_equal(np.asarray(ht1), np.asarray(ht2))
        np.testing.assert_array_equal(np.asarray(hd1), np.asarray(hd2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5
        )
        total += len(ang)
    assert total > 500


def test_crossing_matches_scan_on_large_maps():
    """Maps wider than 32 tiles use the multi-word line-occupancy path
    (n_lw >= 2); hit tiles/dims must still agree with the sequential scan
    — there is no fallback cliff at 32 (round-2 verdict item 4)."""
    rng = np.random.RandomState(1)
    for h, w in [(33, 20), (48, 48), (64, 40), (40, 70)]:
        m = rng.rand(h, w) < 0.15
        m[0] = m[-1] = True
        m[:, 0] = m[:, -1] = True
        free = np.argwhere(~m)
        ti, tj = free[rng.randint(len(free))]
        px = ti + rng.rand() * 0.98 + 0.01
        py = tj + rng.rand() * 0.98 + 0.01
        ang = rng.rand(32) * 2 * np.pi
        dirs = jnp.asarray(
            np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
        )
        words = jnp.asarray(bitmap.pack_bits_np(m))
        pos = jnp.asarray([px, py], jnp.float32)
        ht1, hd1, d1 = jax.jit(
            lambda wo, p, d: raycast.cast_rays_scan(wo, (h, w), p, d, h + w)
        )(words, pos, dirs)
        ht2, hd2, d2 = jax.jit(
            lambda wo, p, d: raycast.cast_rays_crossing(wo, (h, w), p, d)
        )(words, pos, dirs)
        np.testing.assert_array_equal(np.asarray(ht1), np.asarray(ht2))
        np.testing.assert_array_equal(np.asarray(hd1), np.asarray(hd2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5
        )


def test_crossing_gridline_parallel_ray_matches_scan():
    """A ray sliding exactly along a gridline (d_cross == 0, integer
    p_cross) must probe the tile row/column the scan probes (floor), not
    the one below (ADVICE r2: ceil-1 divergence)."""
    h = w = 8
    m = np.zeros((h, w), bool)
    m[0] = m[-1] = True
    m[:, 0] = m[:, -1] = True
    m[5, 4] = True  # obstacle touching the j=4 gridline from above
    words = jnp.asarray(bitmap.pack_bits_np(m))
    # origin on the gridline j=4.0, heading +i: slides along the line
    pos = jnp.asarray([2.5, 4.0], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0]], jnp.float32)
    ht_s, hd_s, d_s = jax.jit(
        lambda wo, p, d: raycast.cast_rays_scan(wo, (h, w), p, d, h + w)
    )(words, pos, dirs)
    ht_c, hd_c, d_c = jax.jit(
        lambda wo, p, d: raycast.cast_rays_crossing(wo, (h, w), p, d)
    )(words, pos, dirs)
    np.testing.assert_array_equal(np.asarray(ht_s), np.asarray(ht_c))
    np.testing.assert_array_equal(np.asarray(hd_s), np.asarray(hd_c))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_c), rtol=1e-6)


@pytest.mark.parametrize("texture", ["none", "checker"])
def test_crossing_trajectory_parity(texture):
    """Fixed-seed pose + pixel parity vs the scalar crossing oracle."""
    cfg = rcw.EnvConfig(
        num_rays=48, height_camera_view_pu=32,
        raycast_backend="crossing", wall_texture=texture,
    )
    game = rcw.SingleRoom(cfg)
    reset = jax.jit(game.reset_single)
    step = jax.jit(game.step_single)
    observe = jax.jit(game.observe_single)
    oracle = OracleWorld(cfg)

    key = jax.random.PRNGKey(5)
    state = reset(key)
    oracle.reset(key)
    rng = np.random.RandomState(5)
    for t in range(260):
        assert np.asarray(state.pos_wu).tolist() == oracle.pos_wu.tolist(), t
        assert float(state.reward) == float(oracle.reward), t
        if t % 13 == 0:
            np.testing.assert_array_equal(
                np.asarray(observe(state)), oracle.camera_view(),
                err_msg=f"step {t}",
            )
        if bool(state.done):
            k = state.rng_key
            state = reset(k)
            oracle.reset(k)
        else:
            a = int(rng.choice(4, p=[0.55, 0.05, 0.2, 0.2]))
            state = step(state, jnp.int32(a))
            oracle.step(a)


def test_crossing_maze_parity():
    """Arbitrary generated map: dynamics + renderer parity on a maze."""
    cfg = rcw.MazeConfig(
        height_tile_map_tu=9, width_tile_map_tu=9,
        num_rays=48, height_camera_view_pu=32,
        raycast_backend="crossing",
    )
    game = rcw.Maze(cfg)
    reset = jax.jit(game.reset_single)
    step = jax.jit(game.step_single)
    observe = jax.jit(game.observe_single)

    key = jax.random.PRNGKey(7)
    state = reset(key)
    wall_map = np.asarray(bitmap.unpack_bits(state.wall_words, (cfg.H, cfg.W)))
    oracle = OracleWorld.from_map(
        cfg, wall_map, np.asarray(state.goal_tu),
        np.asarray(state.pos_wu), int(state.dir_au),
    )
    rng = np.random.RandomState(11)
    for t in range(120):
        assert np.asarray(state.pos_wu).tolist() == oracle.pos_wu.tolist(), t
        if t % 12 == 0:
            np.testing.assert_array_equal(
                np.asarray(observe(state)), oracle.camera_view(),
                err_msg=f"step {t}",
            )
        if bool(state.done):
            break
        a = int(rng.choice(4, p=[0.55, 0.05, 0.2, 0.2]))
        state = step(state, jnp.int32(a))
        oracle.step(a)


def test_crossing_axis_aligned_and_degenerate_rays():
    """dx == 0 / dy == 0 rays and integer positions don't produce NaNs or
    out-of-map hits."""
    cfg = rcw.EnvConfig(num_rays=8, raycast_backend="crossing")
    words = jnp.asarray(cfg.border_wall_words)
    dirs = jnp.asarray(
        [[1, 0], [-1, 0], [0, 1], [0, -1],
         [1, 0], [-1, 0], [0, 1], [0, -1]], jnp.float32
    )
    for pos in ([3.5, 7.5], [3.0, 7.5], [3.5, 7.0], [3.0, 7.0]):
        ht, hd, d = jax.jit(
            lambda p: raycast.cast_rays_crossing(
                words, (cfg.H, cfg.W), p, dirs
            )
        )(jnp.asarray(pos, jnp.float32))
        ht, hd, d = np.asarray(ht), np.asarray(hd), np.asarray(d)
        assert np.isfinite(d).all(), (pos, d)
        assert (d > 0).all(), (pos, d)
        assert (ht[:, 0] >= 0).all() and (ht[:, 0] < cfg.H).all()
        assert (ht[:, 1] >= 0).all() and (ht[:, 1] < cfg.W).all()


def test_crossing_kernel_matches_crossing():
    """The Pallas crossing kernel (batch path, interpret mode on CPU)
    agrees exactly with the XLA crossing backend — hits, dims, distances,
    and the full camera observation — on random states of a bordered room
    and a per-env generated maze."""
    import dataclasses

    cases = [
        rcw.EnvConfig(num_rays=32, height_camera_view_pu=24),
        rcw.MazeConfig(
            num_rays=32, height_camera_view_pu=24,
            height_tile_map_tu=9, width_tile_map_tu=9,
        ),
    ]
    for cfg in cases:
        gx = (rcw.Maze if isinstance(cfg, rcw.MazeConfig) else rcw.SingleRoom)(
            dataclasses.replace(cfg, raycast_backend="crossing")
        )
        gk = type(gx)(dataclasses.replace(cfg, raycast_backend="crossing_kernel"))
        keys = jax.random.split(jax.random.PRNGKey(11), 16)
        state = jax.jit(jax.vmap(gx.reset_single))(keys)
        hx = jax.jit(gx.cast_batch)(state)
        hk = jax.jit(gk.cast_batch)(state)
        np.testing.assert_array_equal(np.asarray(hx.hit_tu), np.asarray(hk.hit_tu))
        np.testing.assert_array_equal(np.asarray(hx.hit_dim), np.asarray(hk.hit_dim))
        np.testing.assert_array_equal(np.asarray(hx.dist_wu), np.asarray(hk.dist_wu))
        np.testing.assert_array_equal(
            np.asarray(jax.jit(gx.observe_batch)(state)),
            np.asarray(jax.jit(gk.observe_batch)(state)),
        )


def test_crossing_kernel_fused_pal8_matches_xla_render():
    """crossing_kernel_fused: the in-kernel pal8 compositing reproduces the
    XLA pal8 render exactly (single-goal families)."""
    import dataclasses

    for cfg in [
        rcw.EnvConfig(
            num_rays=32, height_camera_view_pu=24, obs_type="camera_pal8"
        ),
        rcw.MazeConfig(
            num_rays=32, height_camera_view_pu=24, obs_type="camera_pal8",
            height_tile_map_tu=9, width_tile_map_tu=9,
        ),
    ]:
        cls = rcw.Maze if isinstance(cfg, rcw.MazeConfig) else rcw.SingleRoom
        gx = cls(dataclasses.replace(cfg, raycast_backend="crossing"))
        gk = cls(
            dataclasses.replace(cfg, raycast_backend="crossing_kernel_fused")
        )
        state = jax.jit(jax.vmap(gx.reset_single))(
            jax.random.split(jax.random.PRNGKey(2), 16)
        )
        np.testing.assert_array_equal(
            np.asarray(jax.jit(gx.observe_batch)(state)),
            np.asarray(jax.jit(gk.observe_batch)(state)),
        )


def test_crossing_kernel_fuzz_random_maps():
    """Kernel vs XLA crossing on RANDOM obstacle maps and random interior
    origins/directions — exact agreement on hits, dims and distances."""
    from raycastworlds_tpu.ops import raycast, raycast_crossing_kernel as rck
    from raycastworlds_tpu.ops.bitmap import pack_bits_np

    rng = np.random.RandomState(0)
    for h, w in [(8, 16), (13, 9), (24, 40)]:
        b, r = 8, 64
        maps = []
        for _ in range(b):
            m = rng.rand(h, w) < 0.25
            m[0, :] = m[-1, :] = True
            m[:, 0] = m[:, -1] = True
            maps.append(pack_bits_np(m))
        words = jnp.asarray(np.stack(maps))
        pos = jnp.asarray(
            rng.uniform([1.1, 1.1], [h - 1.1, w - 1.1], size=(b, 2)),
            jnp.float32,
        )
        ang = rng.uniform(0, 2 * np.pi, size=(b, r))
        dirs = jnp.asarray(
            np.stack([np.cos(ang), np.sin(ang)], axis=-1), jnp.float32
        )
        # XLA crossing per env
        def one(wds, p, d):
            return raycast.cast_rays_crossing(wds, (h, w), p, d)
        xt, xd, xs = jax.jit(jax.vmap(one))(words, pos, dirs)
        kt, kd, ks = rck.cast_rays_crossing_kernel(
            words, (h, w), pos, dirs, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(xt), np.asarray(kt))
        np.testing.assert_array_equal(np.asarray(xd), np.asarray(kd))
        np.testing.assert_array_equal(np.asarray(xs), np.asarray(ks))


def test_crossing_kernel_odd_batch_falls_back():
    """Batch sizes the kernel can't block fall back to the XLA crossing."""
    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16,
        raycast_backend="crossing_kernel",
    )
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=3)  # 3 % 8 != 0
    state, obs = env.reset(jax.random.PRNGKey(0))
    res = env.step(state, jnp.zeros(3, jnp.int32))
    assert res.obs.shape == (3, 16, 16)


def test_auto_backend_shape_dispatch(monkeypatch):
    """'auto' resolves to the Pallas crossing kernel exactly on the shapes
    where it measured faster on hardware (>=256 rays, <=96 candidates, f32,
    discrete headings, TPU); everything else stays on XLA crossing."""
    import raycastworlds_tpu.config as config_mod

    # On the CPU test backend, auto is always XLA crossing.
    assert rcw.EnvConfig(num_rays=512).resolved_raycast_backend == "crossing"

    monkeypatch.setattr(config_mod, "_default_backend_is_tpu", lambda: True)
    assert (
        rcw.EnvConfig(num_rays=512).resolved_raycast_backend
        == "crossing_kernel"
    )
    assert (
        rcw.EnvConfig(num_rays=256).resolved_raycast_backend
        == "crossing_kernel"
    )
    # small fan: XLA fuses cast+render and wins
    assert rcw.EnvConfig(num_rays=64).resolved_raycast_backend == "crossing"
    # candidate-heavy map: stays on XLA crossing
    assert (
        rcw.EnvConfig(
            num_rays=512, height_tile_map_tu=64, width_tile_map_tu=64
        ).resolved_raycast_backend
        == "crossing"
    )
    # f64 and continuous headings: kernel bakes f32 / LUT fans
    assert (
        rcw.EnvConfig(num_rays=512, dtype="float64").resolved_raycast_backend
        == "crossing"
    )
    assert (
        rcw.EnvConfig(
            num_rays=512, continuous_heading=True
        ).resolved_raycast_backend
        == "crossing"
    )
    # explicit choices are never overridden
    assert (
        rcw.EnvConfig(
            num_rays=512, raycast_backend="scan"
        ).resolved_raycast_backend
        == "scan"
    )
