"""Debug-mode validation: NaN/out-of-bounds checking for jitted env code.

On-device SPMD is data-race-free by construction (SURVEY.md section 5 — the
reference had nothing to race either), so the debug story is *value*
validation: ``checkify`` promotes NaN/OOB/div-by-zero into collected errors
without leaving jit, and :func:`validate_state` asserts the env-state
invariants the dynamics rely on (player inside the interior, goal on an empty
interior tile, heading in range).
"""

from __future__ import annotations

from typing import Callable

from jax.experimental import checkify

from ..config import EnvConfig
from ..state import EnvState


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable function with checkify NaN/OOB/div checks.

    Returns ``wrapped(*args) -> (error, out)``; call ``error.throw()`` host
    side to raise on failure.  Keep off the hot path (adds guards to every
    op); intended for debugging runs.
    """
    errs = errors if errors is not None else checkify.all_checks
    return checkify.checkify(fn, errors=errs)


def validate_state(cfg: EnvConfig, state: EnvState) -> None:
    """Host-side assertion of batched EnvState invariants (debug only)."""
    import numpy as np

    pos = np.asarray(state.pos_wu)
    goal = np.asarray(state.goal_tu)
    d = np.asarray(state.dir_au)
    walls = np.asarray(state.wall_map)
    assert np.isfinite(pos).all(), "non-finite player position"
    assert (pos > 0).all(), "player outside the map (low)"
    assert (pos[..., 0] < cfg.H).all() and (pos[..., 1] < cfg.W).all(), (
        "player outside the map (high)"
    )
    assert ((d >= 0) & (d < cfg.num_directions)).all(), "heading out of range"
    assert ((goal >= 1)).all(), "goal on the border"
    assert (goal[..., 0] <= cfg.H - 2).all() and (
        goal[..., 1] <= cfg.W - 2
    ).all(), "goal on the border"
    b_idx = np.arange(goal.shape[0])
    assert not walls[b_idx, goal[:, 0], goal[:, 1]].any(), "goal inside a wall"
    # player never stands inside a wall tile
    ti = np.floor(pos[..., 0]).astype(int)
    tj = np.floor(pos[..., 1]).astype(int)
    assert not walls[b_idx, ti, tj].any(), "player inside a wall tile"
