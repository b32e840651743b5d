"""Checkpoint/resume tests: bit-exact trajectory continuation after restore."""

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw
from raycastworlds_tpu.utils import checkpoint


def test_env_state_roundtrip(tmp_path):
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=8)
    state, _ = env.reset(jax.random.PRNGKey(0))
    for a in [0, 2, 0]:
        state = env.step(state, jnp.full(8, a, jnp.int32)).state

    path = checkpoint.save(str(tmp_path / "ck"), state, {"step": 3})
    fresh, _ = env.reset(jax.random.PRNGKey(99))
    restored = checkpoint.restore(path, fresh)

    for got, want in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # exact resume: stepping both produces identical trajectories
    r1 = env.step(state, jnp.full(8, 0, jnp.int32))
    r2 = env.step(restored, jnp.full(8, 0, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(r1.state.pos_wu), np.asarray(r2.state.pos_wu)
    )
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))


def test_metrics_meter():
    from raycastworlds_tpu.utils.profiling import Meter, device_metrics

    done = jnp.array([[True, False], [False, True]])
    reward = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    m = device_metrics(done, reward)
    assert int(m["episodes"]) == 2
    assert float(m["return_sum"]) == 2.0
    assert float(m["success_rate"]) == 1.0
    meter = Meter()
    meter.update(m)
    snap = meter.snapshot()
    assert snap["episodes"] == 2.0
    assert snap["mean_return"] == 1.0
