"""Composable environment wrappers (no reference equivalent — standard RL
tooling the reference leaves to its consumer).

All wrappers preserve the batched functional contract: state is a pytree
carry, ``reset``/``step`` are jittable, auto-reset semantics pass through.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .env import Env, Space, StepResult
from .state import EnvState


class FrameStackState(NamedTuple):
    env_state: EnvState
    frames: jax.Array  # [B, n_stack, *obs_shape]


class FrameStack:
    """Stack the last ``n`` observations along a leading per-env axis.

    On an episode boundary (done) the stack restarts filled with the new
    episode's first observation — no cross-episode leakage.
    """

    def __init__(self, env: Env, n_stack: int = 4):
        if n_stack < 1:
            raise ValueError("n_stack must be >= 1")
        self.env = env
        self.n_stack = n_stack
        self._reset = jax.jit(self._reset_impl)
        self._step = jax.jit(self._step_impl)

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    @property
    def observation_space(self) -> Space:
        s = self.env.observation_space
        return Space(shape=(self.n_stack,) + s.shape, dtype=s.dtype)

    def _reset_impl(self, key):
        state, obs = self.env._reset_impl(key)
        frames = jnp.repeat(obs[:, None], self.n_stack, axis=1)
        return FrameStackState(state, frames), frames

    def _step_impl(self, fs: FrameStackState, action):
        res = self.env._step_impl(fs.env_state, action)
        shifted = jnp.concatenate(
            [fs.frames[:, 1:], res.obs[:, None]], axis=1
        )
        restarted = jnp.repeat(res.obs[:, None], self.n_stack, axis=1)
        done = res.done.reshape(
            res.done.shape + (1,) * (shifted.ndim - res.done.ndim)
        )
        frames = jnp.where(done, restarted, shifted)
        return StepResult(
            FrameStackState(res.state, frames),
            frames,
            res.reward,
            res.done,
            res.info,
        )

    def reset(self, key):
        return self._reset(key)

    def step(self, fs, action):
        return self._step(fs, action)


class ObsTransform:
    """Apply a pure per-batch observation transform (cast, normalize,
    downsample, ...) to an Env's outputs."""

    def __init__(self, env: Env, fn: Callable[[jax.Array], jax.Array]):
        self.env = env
        self.fn = fn
        self._reset = jax.jit(self._reset_impl)
        self._step = jax.jit(self._step_impl)

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    def _reset_impl(self, key):
        state, obs = self.env._reset_impl(key)
        return state, self.fn(obs)

    def _step_impl(self, state, action):
        res = self.env._step_impl(state, action)
        return StepResult(
            res.state, self.fn(res.obs), res.reward, res.done, res.info
        )

    def reset(self, key):
        return self._reset(key)

    def step(self, state, action):
        return self._step(state, action)


def downsample2x(obs: jax.Array) -> jax.Array:
    """Cheap 2x spatial mean-pool for [B, H, W] or [B, H, W, C] images."""
    if obs.ndim == 3:
        x = obs.astype(jnp.float32)
        return 0.25 * (
            x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
        )
    if obs.ndim == 4:
        x = obs.astype(jnp.float32)
        return 0.25 * (
            x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
        )
    raise ValueError(f"expected image obs, got ndim={obs.ndim}")
