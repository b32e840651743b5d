"""Episode GIF export tests (utils/video.py)."""

import os

import jax
import numpy as np
import pytest

import raycastworlds_tpu as rcw
from raycastworlds_tpu.utils import video


def _env():
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16)
    return rcw.Env(rcw.SingleRoom(cfg), num_envs=2)


def test_record_episode_shapes():
    env = _env()
    frames = video.record_episode(env, jax.random.PRNGKey(0), steps=5)
    assert frames.shape == (6, 16, 16)
    assert frames.dtype == np.uint32
    # frames change over time (player moves/turns)
    assert any(
        not np.array_equal(frames[i], frames[i + 1]) for i in range(5)
    )


def test_save_gif_pillow_roundtrip(tmp_path):
    env = _env()
    frames = video.record_episode(env, jax.random.PRNGKey(1), steps=4)
    path = str(tmp_path / "ep.gif")
    video.save_gif(path, frames, fps=10, scale=2)
    data = open(path, "rb").read()
    assert data[:6] in (b"GIF89a", b"GIF87a")
    from PIL import Image

    im = Image.open(path)
    assert im.size == (32, 32)  # scale=2
    im.seek(im.n_frames - 1)
    assert im.n_frames == 5


def test_fallback_gif_is_lossless_for_paletted_frames(tmp_path):
    env = _env()
    frames = video.record_episode(env, jax.random.PRNGKey(2), steps=3)
    path = str(tmp_path / "fb.gif")
    video._write_gif_fallback(path, video._to_rgb(frames), duration_ms=50)
    from PIL import Image

    im = Image.open(path)
    assert im.n_frames == 4
    for t in range(4):
        im.seek(t)
        got = np.asarray(im.convert("RGB"))
        np.testing.assert_array_equal(got, video._to_rgb(frames)[t])


def test_top_view_recording(tmp_path):
    cfg = rcw.EnvConfig(num_rays=16, height_camera_view_pu=16, pu_per_tu=4)
    env = rcw.Env(rcw.SingleRoom(cfg), num_envs=1)
    frames = video.record_episode(env, jax.random.PRNGKey(0), steps=2, view="top")
    assert frames.shape == (3, 8 * 4, 16 * 4)
    video.save_gif(str(tmp_path / "top.gif"), frames)


def test_gif_rejects_bad_shapes(tmp_path):
    with pytest.raises(ValueError):
        video.save_gif(str(tmp_path / "x.gif"), np.zeros((4, 4)))


def test_record_episode_multi_player():
    """Multi-player envs record per-player camera frames [T+1, P, H, W];
    a per-player slice exports to GIF."""
    cfg = rcw.MultiPlayerConfig(
        num_players=2, num_rays=16, height_camera_view_pu=16
    )
    env = rcw.Env(rcw.MultiPlayerRoom(cfg), num_envs=1)
    frames = video.record_episode(env, jax.random.PRNGKey(0), steps=3)
    assert frames.shape == (4, 2, 16, 16)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "p0.gif")
        video.save_gif(p, frames[:, 0], fps=4)
        assert os.path.getsize(p) > 50
