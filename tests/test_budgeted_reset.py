"""Budgeted (lazy subset) auto-reset: Env(reset_budget=K)."""

import jax
import jax.numpy as jnp
import numpy as np

import raycastworlds_tpu as rcw
from raycastworlds_tpu.config import MOVE_FORWARD, TURN_LEFT
from raycastworlds_tpu.models.random_room import RandomRoom, RandomRoomConfig


CFG = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)


def _craft_at_goal(state, indices, cfg):
    """Place the listed envs one step from their goal, facing it."""
    for b in indices:
        state = state.replace(
            goal_tu=state.goal_tu.at[b].set(jnp.array([4, 8])),
            pos_wu=state.pos_wu.at[b].set(jnp.array([4.5, 7.8])),
            dir_au=state.dir_au.at[b].set(cfg.num_directions // 4),
        )
    return state


def test_budget_resets_at_most_k_and_drains():
    env = rcw.Env(rcw.SingleRoom(CFG), num_envs=8, reset_budget=3)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = _craft_at_goal(state, [0, 1, 2, 3, 4], CFG)

    res = env.step(state, jnp.full(8, MOVE_FORWARD, jnp.int32))
    done = np.asarray(res.done)
    assert done[:5].all()  # all five report their episode end once
    np.testing.assert_array_equal(np.asarray(res.reward)[:5], 1.0)
    pend = np.asarray(res.state.pending_reset)
    assert pend.sum() == 2  # budget 3 reset three; two wait
    reset_now = np.asarray(res.state.t)[:5] == 0
    assert reset_now.sum() == 3

    # frozen envs do not move, earn nothing, and report done exactly once
    frozen_idx = np.where(pend)[0]
    res2 = env.step(res.state, jnp.full(8, MOVE_FORWARD, jnp.int32))
    for b in frozen_idx:
        assert not bool(res2.done[b])
        assert float(res2.reward[b]) == 0.0
    # and the remaining two got their reset this step
    assert np.asarray(res2.state.pending_reset).sum() == 0
    assert (np.asarray(res2.state.t)[frozen_idx] == 0).all()


def test_budget_frozen_state_is_unchanged():
    env = rcw.Env(rcw.SingleRoom(CFG), num_envs=4, reset_budget=1)
    state, _ = env.reset(jax.random.PRNGKey(1))
    state = _craft_at_goal(state, [0, 1, 2], CFG)
    res = env.step(state, jnp.full(4, MOVE_FORWARD, jnp.int32))
    pend = np.asarray(res.state.pending_reset)
    assert pend.sum() == 2
    frozen = np.where(pend)[0]
    pos_before = np.asarray(res.state.pos_wu)[frozen]
    res2 = env.step(res.state, jnp.full(4, MOVE_FORWARD, jnp.int32))
    # one of the frozen envs got the next budget slot; the other stayed put
    still = np.where(np.asarray(res2.state.pending_reset))[0]
    assert len(still) == 1
    b = still[0]
    i = list(frozen).index(b)
    np.testing.assert_array_equal(
        np.asarray(res2.state.pos_wu)[b], pos_before[i]
    )


def test_budget_equals_dense_when_budget_covers_all():
    """With budget >= #finishing envs each step, budgeted reset is
    bit-identical to the dense path (same per-env keys drive the resets)."""
    dense = rcw.Env(rcw.SingleRoom(CFG), num_envs=16, jit=False)
    lazy = rcw.Env(rcw.SingleRoom(CFG), num_envs=16, jit=False, reset_budget=16)
    s0, _ = jax.jit(dense._reset_impl)(jax.random.PRNGKey(2))

    def rollout(env, s):
        def body(carry, key):
            s = carry
            a = jax.random.randint(key, (16,), 0, 4, dtype=jnp.int32)
            r = env._step_impl(s, a)
            return r.state, (r.reward, r.done)
        keys = jax.random.split(jax.random.PRNGKey(3), 300)
        return jax.jit(lambda s: jax.lax.scan(body, s, keys))(s)

    fd, (rd, dd) = rollout(dense, s0)
    fl, (rl, dl) = rollout(lazy, s0)
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(dd), np.asarray(dl))
    np.testing.assert_array_equal(np.asarray(fd.pos_wu), np.asarray(fl.pos_wu))
    np.testing.assert_array_equal(np.asarray(fd.dir_au), np.asarray(fl.dir_au))


def test_budget_with_random_room_rollout():
    cfg = RandomRoomConfig(
        height_tile_map_tu=16, width_tile_map_tu=16,
        num_rays=16, height_camera_view_pu=16,
        max_episode_steps=60,
    )
    env = rcw.Env(RandomRoom(cfg), num_envs=32, jit=False, reset_budget=8)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def body(carry, key):
        s = carry
        a = jax.random.choice(key, 4, (32,), p=jnp.array([0.55, 0.05, 0.2, 0.2])).astype(jnp.int32)
        r = env._step_impl(s, a)
        return r.state, (r.reward, r.done)

    keys = jax.random.split(jax.random.PRNGKey(1), 400)
    final, (rews, dones) = jax.jit(lambda s: jax.lax.scan(body, s, keys))(state)
    rews = np.asarray(rews)
    dones = np.asarray(dones)
    assert dones.sum() > 0
    # rewards only ever 0 or goal_reward, and positive reward implies done
    assert set(np.unique(rews)) <= {0.0, cfg.goal_reward}
    assert (rews[~dones] == 0).all()
    # no env stuck pending forever at the end
    assert np.asarray(final.pending_reset).sum() <= 8
