"""Sharded-mesh tests on the virtual 8-device CPU mesh (the standard JAX way
to validate multi-chip programs without hardware; SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.parallel import mesh as mesh_lib
from raycastworlds_tpu.parallel.rollout import steps_per_second_program, rollout_random


CFG = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)


def test_mesh_construction():
    m = mesh_lib.make_mesh()
    assert m.shape[mesh_lib.DATA_AXIS] == 8
    m2 = mesh_lib.make_mesh(dp=4, mp=2)
    assert m2.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(dp=3, mp=2)


def test_sharded_step_matches_single_device():
    """The same jitted rollout program must produce identical results whether
    the env batch lives on one device or sharded over 8."""
    env = rcw.Env(rcw.SingleRoom(CFG), num_envs=16, jit=False)
    state, _ = jax.jit(env._reset_impl)(jax.random.PRNGKey(0))
    run = jax.jit(steps_per_second_program(env, num_steps=8))
    key = jax.random.PRNGKey(1)

    final_1, acc_1 = run(state, key)

    m = mesh_lib.make_mesh()  # 8-way dp
    state_sharded = mesh_lib.shard_env_state(state, m)
    final_8, acc_8 = run(state_sharded, key)

    np.testing.assert_allclose(float(acc_1), float(acc_8), rtol=1e-4)  # reduction order differs across shards
    np.testing.assert_array_equal(
        np.asarray(final_1.pos_wu), np.asarray(final_8.pos_wu)
    )
    np.testing.assert_array_equal(
        np.asarray(final_1.dir_au), np.asarray(final_8.dir_au)
    )


def test_sharded_state_stays_sharded():
    env = rcw.Env(rcw.SingleRoom(CFG), num_envs=16, jit=False)
    state, _ = jax.jit(env._reset_impl)(jax.random.PRNGKey(0))
    m = mesh_lib.make_mesh()
    state = mesh_lib.shard_env_state(state, m)
    final, traj = jax.jit(
        lambda s, k: rollout_random(env, s, k, 4)
    )(state, jax.random.PRNGKey(2))
    # outputs keep the dp sharding (no implicit gather to one device)
    shard_devs = {d for d in final.pos_wu.sharding.device_set}
    assert len(shard_devs) == 8
    assert traj.obs.shape == (4, 16, 16, 16)


def test_metric_reduction_over_mesh():
    """Cross-host/device metric reduction: a jnp.mean over the sharded batch
    axis compiles to a collective and matches the local computation."""
    env = rcw.Env(rcw.SingleRoom(CFG), num_envs=16, jit=False)
    state, _ = jax.jit(env._reset_impl)(jax.random.PRNGKey(0))
    m = mesh_lib.make_mesh()
    sharded = mesh_lib.shard_env_state(state, m)
    mean_pos = jax.jit(lambda s: jnp.mean(s.pos_wu))(sharded)
    np.testing.assert_allclose(
        float(mean_pos), float(np.mean(np.asarray(state.pos_wu))), rtol=1e-6
    )
