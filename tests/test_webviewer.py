"""Web play viewer: serve frames + key-driven stepping over HTTP."""

import json
import urllib.request

import raycastworlds_tpu as rcw
from raycastworlds_tpu.utils.webviewer import WebViewer


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_webviewer_smoke():
    env = rcw.Env(
        rcw.SingleRoom(rcw.EnvConfig(num_rays=32, height_camera_view_pu=32)),
        num_envs=1,
    )
    viewer = WebViewer(env, seed=3, host="127.0.0.1", port=0).start()
    base = f"http://127.0.0.1:{viewer.port}"
    try:
        page = _get(base + "/")
        assert b"raycastworlds_tpu" in page
        frame0 = _get(base + "/frame.png")
        assert frame0[:8] == b"\x89PNG\r\n\x1a\n"

        st = json.loads(_get(base + "/status"))
        assert st["steps"] == 0 and st["view"] == "camera"

        # step forward; frame changes, step count increments
        out = json.loads(_get(base + "/key?k=w"))
        assert out["ok"] and out["steps"] == 1
        frame1 = _get(base + "/frame.png")
        assert frame1[:8] == b"\x89PNG\r\n\x1a\n"

        # toggle top view renders a different image
        out = json.loads(_get(base + "/key?k=v"))
        assert out["view"] == "top"
        frame_top = _get(base + "/frame.png")
        assert frame_top != frame1

        # reset zeroes the step count
        out = json.loads(_get(base + "/key?k=r"))
        assert out["steps"] == 0

        # unknown keys are rejected, quit flips the flag
        assert not json.loads(_get(base + "/key?k=x"))["ok"]
        assert json.loads(_get(base + "/key?k=q"))["quit"]
    finally:
        viewer.stop()
