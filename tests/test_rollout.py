"""Batched rollout property test — the reference's own test, vectorized.

/root/reference/test/runtests.jl: random actions; whenever an episode
terminates its return must be exactly ``goal_reward`` (= 1.0).  Here: many
envs in lockstep under one jitted ``lax.scan``, auto-reset folding resets into
the step."""

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw


def test_terminal_returns_are_goal_reward():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16, obs_type="depth")
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=32, jit=False)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def body(carry, key):
        state = carry
        # forward-biased actions so goals are reached within the horizon
        a = jax.random.choice(
            key, 4, (32,), p=jnp.array([0.55, 0.05, 0.2, 0.2])
        ).astype(jnp.int32)
        res = env._step_impl(state, a)
        return res.state, (res.done, res.info["episode_return"], res.info["terminal_t"])

    keys = jax.random.split(jax.random.PRNGKey(1), 1000)
    final, (dones, rets, ts) = jax.jit(
        lambda s: jax.lax.scan(body, s, keys)
    )(state)

    dones = np.asarray(dones)
    rets = np.asarray(rets)
    ts = np.asarray(ts)
    n_episodes = int(dones.sum())
    assert n_episodes >= 5, "expected some episodes to terminate"
    # every terminal return equals goal_reward exactly
    np.testing.assert_array_equal(rets[dones], cfg.goal_reward)
    # non-terminal running returns are always 0 (only terminal step pays)
    np.testing.assert_array_equal(rets[~dones], 0.0)
    assert (ts[dones] > 0).all()


def test_rollout_scan_obs_shapes():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=4, jit=False)
    state, obs0 = env.reset(jax.random.PRNGKey(0))

    def body(state, key):
        a = jax.random.randint(key, (4,), 0, 4, dtype=jnp.int32)
        res = env._step_impl(state, a)
        return res.state, res.obs

    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    _, obs = jax.jit(lambda s: jax.lax.scan(body, s, keys))(state)
    assert obs.shape == (8, 4, 16, 16)
    assert obs.dtype == jnp.uint32
