"""Debug utilities: checkify wrapping and state validation."""

import jax
import jax.numpy as jnp
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.utils import debug


def test_checked_step_passes_clean():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    game = rcw.SingleRoom(cfg)
    state = jax.jit(game.reset_single)(jax.random.PRNGKey(0))
    f = jax.jit(debug.checked(lambda s: game.step_single(s, jnp.int32(0))))
    err, out = f(state)
    err.throw()  # no error on a valid state


def test_validate_state_catches_bad_state():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(0))
    debug.validate_state(cfg, state)  # clean
    bad = state.replace(pos_wu=state.pos_wu.at[0].set(jnp.array([-1.0, 2.0])))
    with pytest.raises(AssertionError):
        debug.validate_state(cfg, bad)
