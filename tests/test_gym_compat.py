"""GymAdapter single-env facade tests."""

import numpy as np
import pytest

import raycastworlds_tpu as rcw


def test_gym_adapter_loop():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    env = rcw.GymAdapter(rcw.SingleRoom(cfg), max_episode_steps=50)
    obs, info = env.reset(seed=0)
    assert obs.shape == cfg.obs_shape
    total = 0.0
    rng = np.random.RandomState(0)
    for t in range(60):
        obs, reward, terminated, truncated, info = env.step(int(rng.randint(4)))
        total += reward
        if terminated:
            assert total == cfg.goal_reward
            obs, info = env.reset(seed=t + 1)
            total = 0.0
        elif truncated:
            obs, info = env.reset(seed=t + 100)
            total = 0.0
    frame = env.render()
    assert frame.shape == (16, 16, 3) and frame.dtype == np.uint8
    env.close()


def test_vector_adapter_contract():
    """GymVectorAdapter: batched 5-tuple with autoreset semantics."""
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    venv = rcw.GymVectorAdapter(rcw.SingleRoom(cfg), num_envs=4)
    obs, info = venv.reset(seed=0)
    assert obs.shape == (4, 16, 16) and isinstance(info, dict)
    for _ in range(5):
        obs, rew, term, trunc, info = venv.step(np.zeros(4, np.int64))
        assert obs.shape == (4, 16, 16)
        assert rew.shape == term.shape == trunc.shape == (4,)
    frames = venv.render()
    assert frames.shape == (4, 16, 16, 3) and frames.dtype == np.uint8
    # determinism under explicit seeds
    a, _ = venv.reset(seed=7)
    b, _ = venv.reset(seed=7)
    np.testing.assert_array_equal(a, b)
    # unseeded resets continue the stream (different episodes)
    c, _ = venv.reset()
    assert not (a == c).all()
    venv.close()


def test_vector_adapter_rejects_multi_player():
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16
    )
    with pytest.raises(ValueError, match="single-agent"):
        rcw.GymVectorAdapter(rcw.MultiPlayerRoom(cfg), num_envs=2)


def test_vector_adapter_final_observation():
    """final_observation=True exposes the pre-reset terminal obs (gymnasium
    convention for bootstrapping truncated episodes)."""
    import dataclasses

    cfg = rcw.EnvConfig(
        num_rays=16, height_camera_view_pu=16, max_episode_steps=3
    )
    venv = rcw.GymVectorAdapter(
        rcw.SingleRoom(cfg), num_envs=4, final_observation=True
    )
    obs, info = venv.reset(seed=0)
    saw_divergence = False
    for _ in range(6):
        obs, rew, term, trunc, info = venv.step(np.zeros(4, np.int64))
        assert "final_observation" in info
        fin = info["final_observation"]
        assert fin.shape == obs.shape and fin.dtype == obs.dtype
        ended = term | trunc
        # where no episode ended, the terminal obs IS the returned obs
        np.testing.assert_array_equal(fin[~ended], obs[~ended])
        if ended.any() and not (fin[ended] == obs[ended]).all():
            saw_divergence = True
    # max_episode_steps=3 guarantees truncations happened, and a fresh spawn
    # essentially never reproduces the frame 3 steps into the old episode
    assert saw_divergence
    # default stays lean: no second render, no info key
    venv2 = rcw.GymVectorAdapter(rcw.SingleRoom(cfg), num_envs=4)
    venv2.reset(seed=0)
    _, _, _, _, info2 = venv2.step(np.zeros(4, np.int64))
    assert "final_observation" not in info2
    venv.close()
    venv2.close()
