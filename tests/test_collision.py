"""Circle-vs-AABB collision tests against hand-computed cases
(reference semantics: /root/reference/src/collision_detection.jl)."""

import jax
import jax.numpy as jnp
import numpy as np

from raycastworlds_tpu.ops import collision


def _walls(h=8, w=8):
    m = np.zeros((h, w), dtype=bool)
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = True
    return jnp.asarray(m)


def test_tile_test_center_inside():
    # circle center inside the tile always collides
    pos = jnp.array([3.5, 3.5], jnp.float32)
    tile = jnp.array([3, 3], jnp.int32)
    assert bool(collision.is_colliding_tile(pos, tile, 0.125))


def test_tile_test_edge_cases():
    tile = jnp.array([3, 3], jnp.int32)  # spans [3,4)x[3,4)
    r = 0.125
    # just outside the face by more than r: no collision
    pos = jnp.array([2.8, 3.5], jnp.float32)
    assert not bool(collision.is_colliding_tile(pos, tile, r))
    # within r of the face: collision
    pos = jnp.array([2.9, 3.5], jnp.float32)
    assert bool(collision.is_colliding_tile(pos, tile, r))
    # exactly r away: strict inequality -> no collision (ref :14-19)
    pos = jnp.array([3.0 - r, 3.5], jnp.float32)
    assert not bool(collision.is_colliding_tile(pos, tile, r))
    # corner: distance to corner (3,3) must be < r
    d = r / np.sqrt(2) * 0.99
    pos = jnp.array([3.0 - d, 3.0 - d], jnp.float32)
    assert bool(collision.is_colliding_tile(pos, tile, r))
    d = r / np.sqrt(2) * 1.01
    pos = jnp.array([3.0 - d, 3.0 - d], jnp.float32)
    assert not bool(collision.is_colliding_tile(pos, tile, r))


def test_player_colliding_against_border():
    walls = _walls()
    r = 0.125
    center = jnp.array([4.0, 4.0], jnp.float32)
    assert not bool(collision.is_player_colliding(walls, center, r))
    # close to the left wall (wall tile row 0 spans [0,1))
    near = jnp.array([1.05, 4.0], jnp.float32)
    assert bool(collision.is_player_colliding(walls, near, r))
    far = jnp.array([1.2, 4.0], jnp.float32)
    assert not bool(collision.is_player_colliding(walls, far, r))


def test_player_colliding_vmaps():
    walls = _walls()
    pos = jnp.array([[4.0, 4.0], [1.05, 4.0]], jnp.float32)
    out = jax.vmap(lambda p: collision.is_player_colliding(walls, p, 0.125))(pos)
    assert list(np.asarray(out)) == [False, True]


def test_goal_collision_matches_map_scan():
    # the single-AABB goal test must equal a 3x3 map scan over a goal map
    key = jax.random.PRNGKey(0)
    for i in range(50):
        k1, k2, key = jax.random.split(key, 3)
        pos = jax.random.uniform(k1, (2,), minval=1.0, maxval=7.0)
        goal = jax.random.randint(k2, (2,), 1, 7)
        goal_map = jnp.zeros((8, 8), bool).at[goal[0], goal[1]].set(True)
        a = bool(collision.is_colliding_with_goal(pos, goal, 0.125))
        b = bool(collision.is_player_colliding(goal_map, pos, 0.125))
        assert a == b, (pos, goal)
