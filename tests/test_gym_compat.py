"""GymAdapter single-env facade tests."""

import numpy as np

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
