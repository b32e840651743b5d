"""Checkpoint round-trip determinism on a sharded mesh (roadmap item 10).

Saves a mesh-sharded batched EnvState, restores it (a) back onto the mesh
and (b) onto a single device, and verifies bit-exact trajectory
continuation in both layouts — sharding is a placement detail, never a
semantics change.  Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.parallel import mesh as mesh_lib
from raycastworlds_tpu.utils import checkpoint


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return mesh_lib.make_mesh(dp=8)


def _env(num_envs=16):
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    return rcw.Env(rcw.SingleRoom(cfg), num_envs=num_envs)


def _rollout(env, state, actions_seq):
    for a in actions_seq:
        state = env.step(state, jnp.full(env.num_envs, a, jnp.int32)).state
    return state


def test_sharded_save_restore_continues_bitexact(tmp_path, mesh):
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = mesh_lib.shard_env_state(state, mesh)
    state = _rollout(env, state, [0, 2, 0, 3, 1])

    path = checkpoint.save(str(tmp_path / "ck_sharded"), state, {"t": 5})

    # (a) restore onto the mesh
    fresh, _ = env.reset(jax.random.PRNGKey(7))
    fresh = mesh_lib.shard_env_state(fresh, mesh)
    restored_sharded = checkpoint.restore(path, fresh)
    restored_sharded = mesh_lib.shard_env_state(restored_sharded, mesh)

    # (b) restore single-device (no mesh placement)
    fresh1, _ = env.reset(jax.random.PRNGKey(8))
    restored_single = checkpoint.restore(path, fresh1)

    tail = [1, 0, 0, 2, 0, 0, 0]
    want = _rollout(env, state, tail)
    got_sharded = _rollout(env, restored_sharded, tail)
    got_single = _rollout(env, restored_single, tail)

    for a, b, c in zip(
        jax.tree_util.tree_leaves(want),
        jax.tree_util.tree_leaves(got_sharded),
        jax.tree_util.tree_leaves(got_single),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_sharded_obs_match_after_restore(tmp_path, mesh):
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(1))
    sharded = mesh_lib.shard_env_state(state, mesh)
    path = checkpoint.save(str(tmp_path / "ck2"), sharded)
    restored = checkpoint.restore(path, state)
    r1 = env.step(sharded, jnp.zeros(env.num_envs, jnp.int32))
    r2 = env.step(restored, jnp.zeros(env.num_envs, jnp.int32))
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))
    np.testing.assert_array_equal(
        np.asarray(r1.state.rng_key), np.asarray(r2.state.rng_key)
    )
