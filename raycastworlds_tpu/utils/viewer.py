"""Host-side frame viewing and the interactive play loop.

The reference's `play!` opens a minifb window with a keyboard callback
(/root/reference/src/single_room.jl:488-568) — its only native dependency.
TPU hosts are headless, so the equivalent here is:

* the native C++ viewer (native/viewer.cpp, loaded via ctypes): PPM writer +
  ANSI half-block compositor + frame differ, with pure-NumPy fallbacks when
  the shared library is not built;
* ``play()``: terminal-interactive play with the reference's key map
  (w/s/a/d -> actions 0-3, r = reset, v = toggle camera/top view, q = quit;
  ``get_action_keys``/``get_action_names``, ref :485-486) rendering frames as
  ANSI half-blocks.
"""

from __future__ import annotations

import ctypes
import os
import sys
import zlib
import struct
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native_lib() -> Optional[ctypes.CDLL]:
    """Load (and lazily build) the native viewer library."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(root, "native", "libviewer.so")
    if not os.path.exists(so):
        mk = os.path.join(root, "native", "Makefile")
        if os.path.exists(mk):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(mk)],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
            except Exception:
                return None
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        lib.rcw_write_ppm.restype = ctypes.c_int
        lib.rcw_write_ppm.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rcw_ansi_render.restype = ctypes.c_long
        lib.rcw_ansi_render.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        lib.rcw_frame_diff.restype = ctypes.c_long
        lib.rcw_frame_diff.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_long,
        ]
        _LIB = lib
    return _LIB


def _as_u32(img) -> np.ndarray:
    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint32))
    if a.ndim != 2:
        raise ValueError(f"expected [H, W] u32 frame, got {a.shape}")
    return a


def save_ppm(path: str, img) -> None:
    """Write a 0x00RRGGBB frame as binary PPM (native fast path)."""
    a = _as_u32(img)
    lib = _native_lib()
    if lib is not None:
        rc = lib.rcw_write_ppm(
            path.encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            a.shape[0],
            a.shape[1],
        )
        if rc == 0:
            return
    from ..colors import u32_to_rgb

    rgb = u32_to_rgb(a)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (a.shape[1], a.shape[0]))
        f.write(rgb.tobytes())


def save_png(path: str, img) -> None:
    """Minimal dependency-free PNG writer (8-bit RGB)."""
    from ..colors import u32_to_rgb

    a = _as_u32(img)
    rgb = u32_to_rgb(a)
    h, w = a.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def ansi_frame(img, max_width: int = 160) -> str:
    """Render a u32 frame as a 24-bit-color ANSI half-block string
    (2 vertical pixels per character row).  Downsamples to ``max_width``."""
    a = _as_u32(img)
    h, w = a.shape
    if w > max_width:
        f = (w + max_width - 1) // max_width
        a = np.ascontiguousarray(a[:: f, :: f])
        h, w = a.shape
    lib = _native_lib()
    if lib is not None:
        cap = (h // 2 + 1) * (w + 1) * 64 + 64
        buf = ctypes.create_string_buffer(cap)
        n = lib.rcw_ansi_render(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), h, w, buf, cap
        )
        if n >= 0:
            return buf.raw[:n].decode()
    # NumPy fallback
    lines = []
    for i in range(0, h - 1, 2):
        parts = []
        for j in range(w):
            t, b = int(a[i, j]), int(a[i + 1, j])
            parts.append(
                f"\x1b[38;2;{(t>>16)&255};{(t>>8)&255};{t&255}m"
                f"\x1b[48;2;{(b>>16)&255};{(b>>8)&255};{b&255}m▀"
            )
        lines.append("".join(parts) + "\x1b[0m")
    return "\n".join(lines) + "\n"


ACTION_KEYS = ("w", "s", "a", "d")  # ref get_action_keys, single_room.jl:485


def play(env=None, seed: int = 0, max_width: int = 128, out=sys.stdout):
    """Interactive terminal play (ref ``play!``, single_room.jl:488-568).

    Keys: w/s/a/d = forward/backward/turn-left/turn-right, r = reset,
    v = toggle camera/top view, q = quit.  Requires a TTY; frames render as
    ANSI half-blocks.
    """
    import jax
    import jax.numpy as jnp

    import raycastworlds_tpu as rcw

    if env is None:
        env = rcw.Env(
            rcw.SingleRoom(rcw.EnvConfig(num_rays=128, height_camera_view_pu=128)),
            num_envs=1,
        )
    state, obs = env.reset(jax.random.PRNGKey(seed))
    camera = jax.jit(jax.vmap(env.game.camera_view_single))
    top = jax.jit(jax.vmap(env.game.top_view_single))

    view = 0  # 0 = camera (ref CAMERA_VIEW), 1 = top
    steps = 0

    def draw():
        img = camera(state)[0] if view == 0 else top(state)[0]
        out.write("\x1b[H\x1b[2J")
        out.write(ansi_frame(np.asarray(img), max_width=max_width))
        out.write(
            f"steps={steps} reward={float(state.reward[0]):.1f} "
            f"done={bool(state.done[0])}  [wasd move/turn, r reset, v view, q quit]\n"
        )
        out.flush()

    if not sys.stdin.isatty():
        draw()
        out.write("(no TTY: rendered one frame and exited)\n")
        return

    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setcbreak(fd)
        draw()
        while True:
            ch = sys.stdin.read(1)
            if ch == "q":
                break
            elif ch == "r":
                state, obs = env.reset(jax.random.PRNGKey(seed + steps + 1))
                steps = 0
            elif ch == "v":
                view = 1 - view
            elif ch in ACTION_KEYS:
                a = ACTION_KEYS.index(ch)
                res = env.step(state, jnp.full(env.num_envs, a, jnp.int32))
                state = res.state
                steps += 1
            else:
                continue
            draw()
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
