"""Property-based fuzzing: DDA vs the scalar oracle over random maps/poses,
and the bit-packed lookup vs dense indexing (hypothesis)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from raycastworlds_tpu.ops import bitmap, raycast


def _dda_scalar(obstacle, px, py, dx, dy, max_steps):
    """Independent scalar Lodev DDA (mirrors oracle.cast_one)."""
    import math

    px, py, dx, dy = np.float32(px), np.float32(py), np.float32(dx), np.float32(dy)
    mi, mj = int(math.floor(px)), int(math.floor(py))
    di = np.float32(abs(np.float32(1.0) / dx)) if dx != 0 else np.float32(np.inf)
    dj = np.float32(abs(np.float32(1.0) / dy)) if dy != 0 else np.float32(np.inf)
    si = np.float32(((px - np.float32(math.floor(px))) if dx < 0 else (np.float32(1.0) - (px - np.float32(math.floor(px))))) * di)
    sj = np.float32(((py - np.float32(math.floor(py))) if dy < 0 else (np.float32(1.0) - (py - np.float32(math.floor(py))))) * dj)
    sti, stj = (-1 if dx < 0 else 1), (-1 if dy < 0 else 1)
    h, w = obstacle.shape
    dist, dim, hit = np.float32(np.finfo(np.float32).max), 1, False
    for _ in range(max_steps):
        if si < sj:
            d, si, mi, dim = si, np.float32(si + di), mi + sti, 0
        else:
            d, sj, mj, dim = sj, np.float32(sj + dj), mj + stj, 1
        ci, cj = min(max(mi, 0), h - 1), min(max(mj, 0), w - 1)
        if obstacle[ci, cj]:
            return mi, mj, dim, np.float32(d)
    return mi, mj, dim, dist


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(4, 12),
    w=st.integers(4, 12),
    density=st.floats(0.0, 0.4),
    angle=st.floats(0.0, 6.28318),
)
def test_dda_matches_scalar_on_random_maps(seed, h, w, density, angle):
    rng = np.random.RandomState(seed)
    obstacle = rng.rand(h, w) < density
    obstacle[0, :] = obstacle[-1, :] = True
    obstacle[:, 0] = obstacle[:, -1] = True
    # random interior, non-obstacle origin at a non-integer position
    empties = np.argwhere(~obstacle)
    if len(empties) == 0:
        return
    oi, oj = empties[rng.randint(len(empties))]
    px = np.float32(oi + 0.25 + 0.5 * rng.rand())
    py = np.float32(oj + 0.25 + 0.5 * rng.rand())
    d = np.array([np.cos(angle), np.sin(angle)], np.float32)
    d /= np.float32(np.sqrt(np.float32(d[0] * d[0] + d[1] * d[1])))

    steps = h + w
    words = bitmap.pack_bits(jnp.asarray(obstacle))
    hit_tu, hit_dim, dist = jax.jit(
        lambda wds, p, dd: raycast.cast_rays_scan(
            wds, (h, w), p, dd, steps
        )
    )(words, jnp.asarray([px, py]), jnp.asarray(d)[None, :])

    smi, smj, sdim, sdist = _dda_scalar(obstacle, px, py, d[0], d[1], steps)
    assert int(hit_tu[0, 0]) == smi
    assert int(hit_tu[0, 1]) == smj
    assert int(hit_dim[0]) == sdim
    assert float(dist[0]) == float(sdist)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), h=st.integers(1, 20), w=st.integers(1, 40))
def test_packed_lookup_fuzz(seed, h, w):
    rng = np.random.RandomState(seed)
    m = rng.rand(h, w) < rng.rand()
    words = bitmap.pack_bits(jnp.asarray(m))
    idx = jnp.asarray(rng.randint(0, h * w, size=(17,)), jnp.int32)
    got = np.asarray(bitmap.lookup_bit(words, idx))
    np.testing.assert_array_equal(got, m.reshape(-1)[np.asarray(idx)])


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    # up to 48 wide: exercises the multi-word (n_lw == 2) line-occupancy
    # path, not just the single-u32 fast case
    h=st.integers(4, 48),
    w=st.integers(4, 48),
    density=st.floats(0.0, 0.4),
    angle=st.floats(0.0, 6.28318),
)
def test_crossing_matches_cpp_engine(seed, h, w, density, angle):
    """Randomized-map fuzz of the jitted crossing backend against the
    independent C++ rcw_cast_crossing (same closed-form contract)."""
    import ctypes

    from raycastworlds_tpu.oracle.native import native_lib

    lib = native_lib()
    if lib is None:
        import pytest

        pytest.skip("librefengine.so not built")

    rng = np.random.RandomState(seed)
    obstacle = rng.rand(h, w) < density
    obstacle[0, :] = obstacle[-1, :] = True
    obstacle[:, 0] = obstacle[:, -1] = True
    empties = np.argwhere(~obstacle)
    if len(empties) == 0:
        return
    oi, oj = empties[rng.randint(len(empties))]
    px = np.float32(oi + 0.25 + 0.5 * rng.rand())
    py = np.float32(oj + 0.25 + 0.5 * rng.rand())
    d = np.array([np.cos(angle), np.sin(angle)], np.float32)
    d /= np.float32(np.sqrt(np.float32(d[0] * d[0] + d[1] * d[1])))

    words = bitmap.pack_bits(jnp.asarray(obstacle))
    hit_tu, hit_dim, dist = jax.jit(
        lambda wds, p, dd: raycast.cast_rays_crossing(wds, (h, w), p, dd)
    )(words, jnp.asarray([px, py]), jnp.asarray(d)[None, :])

    obs_u8 = np.ascontiguousarray(obstacle, np.uint8)
    fan = np.ascontiguousarray(d[None, :], np.float32)
    ci = np.zeros(1, np.int32)
    cj = np.zeros(1, np.int32)
    cdim = np.zeros(1, np.int32)
    cdist = np.zeros(1, np.float32)
    p32 = ctypes.POINTER(ctypes.c_float)
    pi32 = ctypes.POINTER(ctypes.c_int32)
    lib.rcw_cast_crossing(
        obs_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        fan.ctypes.data_as(p32), 1,
        ctypes.c_float(px), ctypes.c_float(py),
        ci.ctypes.data_as(pi32), cj.ctypes.data_as(pi32),
        cdim.ctypes.data_as(pi32), cdist.ctypes.data_as(p32),
    )
    assert int(hit_tu[0, 0]) == int(ci[0])
    assert int(hit_tu[0, 1]) == int(cj[0])
    assert int(hit_dim[0]) == int(cdim[0])
    assert float(dist[0]) == float(cdist[0])
