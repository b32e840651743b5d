"""Generic geometry precision (EnvConfig.dtype) — the reference is generic
over T (/root/reference/src/single_room.jl:42-44); here float64 worlds run
under JAX x64 mode.  Parity oracles stay float32, so f64 coverage is
invariant- and consistency-based: dynamics invariants hold, observations are
finite, and f64 results agree with f32 to float32 accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw


def _drive(cfg, n_steps=60, seed=2):
    game = rcw.SingleRoom(cfg)
    reset = jax.jit(game.reset_single)
    step = jax.jit(game.step_single)
    observe = jax.jit(game.observe_single)
    state = reset(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    poses = []
    for _ in range(n_steps):
        poses.append(np.asarray(state.pos_wu, np.float64))
        a = int(rng.choice(4, p=[0.55, 0.05, 0.2, 0.2]))
        state = step(state, jnp.int32(a))
    return np.stack(poses), np.asarray(observe(state)), state


def test_float64_world_runs_and_matches_f32_closely():
    with jax.enable_x64():
        cfg64 = rcw.EnvConfig(
            num_rays=32, height_camera_view_pu=32, dtype="float64"
        )
        p64, obs64, s64 = _drive(cfg64)
        assert s64.pos_wu.dtype == jnp.float64
        assert obs64.dtype == np.uint32
        # walls/collision invariants: player stays inside the interior
        assert (p64 > 0.5).all() and (p64[:, 0] < cfg64.H - 0.5).all()

    cfg32 = rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)
    p32, obs32, _ = _drive(cfg32)
    # Same PRNG stream, same actions: the spawn is identical (the sampler is
    # float32 internally by contract) and early steps agree to f32 accuracy.
    # Full-horizon agreement is NOT expected — a collision decision landing
    # within one f32 ulp of the radius threshold legitimately resolves
    # differently in f64 and forks the trajectory.
    np.testing.assert_allclose(p64[:10], p32[:10], rtol=0, atol=1e-5)


def test_float64_depth_observation_dtype():
    with jax.enable_x64():
        cfg = rcw.EnvConfig(num_rays=16, obs_type="depth", dtype="float64")
        env = rcw.Env(rcw.SingleRoom(cfg), num_envs=3)
        assert env.observation_space.dtype == np.float64
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.dtype == jnp.float64
        assert bool(jnp.isfinite(obs).all())
        res = env.step(state, jnp.zeros(3, jnp.int32))
        assert res.obs.dtype == jnp.float64


def test_float64_requires_valid_dtype():
    with pytest.raises(ValueError, match="dtype"):
        rcw.EnvConfig(dtype="float16")
