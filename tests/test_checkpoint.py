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


def test_checkpoint_multi_player_state_roundtrip(tmp_path):
    """MultiPlayerRoom EnvState (player-axis leaves) round-trips exactly."""
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16
    )
    env = rcw.Env(rcw.MultiPlayerRoom(cfg), num_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(0))
    res = env.step(state, env.sample_action(jax.random.PRNGKey(1)))
    path = str(tmp_path / "mp_state")
    checkpoint.save(path, res.state)
    loaded = checkpoint.restore(path, res.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(res.state),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps identically to the original
    a1 = env.step(res.state, env.sample_action(jax.random.PRNGKey(2)))
    a2 = env.step(loaded, env.sample_action(jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(np.asarray(a1.obs), np.asarray(a2.obs))


def test_checkpoint_rnn_train_state_roundtrip(tmp_path):
    """RecurrentPPOTrainer state (params + GRU hidden + env state)
    round-trips and resumes bit-identically."""
    from raycastworlds_tpu.parallel.ppo import PPOConfig
    from raycastworlds_tpu.parallel.ppo_rnn import RecurrentPPOTrainer

    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, obs_type="camera_gray"
    )
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=4)
    trainer = RecurrentPPOTrainer(
        env, PPOConfig(rollout_steps=3, num_minibatches=2), hidden=16
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_step(ts)
    path = str(tmp_path / "rnn_ts")
    checkpoint.save(path, ts)
    loaded = checkpoint.restore(path, ts)
    ts2, m2 = trainer.train_step(loaded)
    ts1, m1 = trainer.train_step(ts)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(
        np.asarray(ts1.hidden), np.asarray(ts2.hidden)
    )


def test_checkpoint_locked_room_state_roundtrip(tmp_path):
    """LockedRoom EnvState (key_tu / key_held leaves) round-trips exactly
    and resumes bit-identically — including a collected key."""
    cfg = rcw.LockedRoomConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.Env(rcw.LockedRoom(cfg), num_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # flip one env's key to exercise a non-uniform key_held leaf
    state = state.replace(
        key_held=jnp.asarray([True, False, False, True])
    )
    res = env.step(state, env.sample_action(jax.random.PRNGKey(1)))
    path = str(tmp_path / "locked_state")
    checkpoint.save(path, res.state)
    loaded = checkpoint.restore(path, res.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(res.state),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(loaded.key_held), np.asarray(res.state.key_held)
    )
    a1 = env.step(res.state, env.sample_action(jax.random.PRNGKey(2)))
    a2 = env.step(loaded, env.sample_action(jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(np.asarray(a1.obs), np.asarray(a2.obs))
