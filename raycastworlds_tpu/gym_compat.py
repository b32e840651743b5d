"""Single-env Gymnasium-style adapter.

The reference's RL integration is a thin wrapper exposing
state/action_space/reward/is_terminated to ReinforcementLearningBase
(/root/reference/src/rlbase.jl, /root/reference/src/single_room.jl:570-584).
The batched :class:`raycastworlds_tpu.Env` is the native API; this adapter
gives the familiar single-env imperative five-tuple interface for drop-in use
with host-loop RL libraries — no gymnasium dependency required, but the
method contract matches gymnasium.Env (reset -> (obs, info),
step -> (obs, reward, terminated, truncated, info), render -> rgb array).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .env import Env
from .models.base import Game


class GymAdapter:
    """Imperative single-env facade over the batched functional core."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, game: Game, max_episode_steps: Optional[int] = None):
        if getattr(game, "action_shape", ()) != ():
            raise ValueError(
                "GymAdapter is single-agent (scalar action/reward per env); "
                "drive MultiPlayerRoom through the batched Env API instead"
            )
        self._env = Env(game, num_envs=1, auto_reset=False)
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self._max_steps = max_episode_steps
        self.action_space = self._env.action_space
        self.observation_space = self._env.observation_space

    def reset(
        self, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        # Gymnasium contract: an explicit seed re-seeds the stream; seed=None
        # CONTINUES it (each unseeded reset draws the next episode from the
        # same PRNG stream rather than replaying episode 0).
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k_reset = jax.random.split(self._key)
        self._state, obs = self._env.reset(k_reset)
        return np.asarray(obs[0]), {}

    def step(self, action: int):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        res = self._env.step(
            self._state, jnp.asarray([int(action)], jnp.int32)
        )
        self._state = res.state
        obs = np.asarray(res.obs[0])
        reward = float(res.reward[0])
        terminated = bool(res.info["terminated"][0])
        truncated = bool(res.info["truncated"][0]) or (
            self._max_steps is not None
            and int(res.state.t[0]) >= self._max_steps
            and not terminated
        )
        info = {k: np.asarray(v[0]) for k, v in res.info.items()}
        return obs, reward, terminated, truncated, info

    def render(self) -> np.ndarray:
        """uint8 RGB frame of the camera view."""
        from .colors import u32_to_rgb

        img = np.asarray(self._env.camera_view(self._state)[0])
        return u32_to_rgb(img)

    def close(self) -> None:
        self._state = None


class GymVectorAdapter:
    """Imperative vectorized facade matching the gymnasium.vector.VectorEnv
    contract (reset -> (obs[N], info), step -> (obs[N], reward[N],
    terminated[N], truncated[N], info)) with autoreset: the obs returned for
    a finished env already belongs to its next episode, while
    reward/terminated/truncated describe the finishing transition — the
    standard vector-env convention, and exactly what the batched
    functional :class:`Env` computes natively.  Everything stays one jitted
    device program per step; only the returned arrays cross to the host.
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(
        self,
        game: Game,
        num_envs: int,
        reset_budget: int = 0,
        final_observation: bool = False,
    ):
        """``final_observation=True`` adds the gymnasium terminal-observation
        convention: ``info["final_observation"]`` holds the PRE-reset obs of
        every env (meaningful where terminated|truncated is set — consumers
        bootstrapping truncated episodes need it), at the cost of a second
        batch render per step.  Off by default: the returned obs for a
        finished env is the next episode's first frame (same-step autoreset).
        """
        if getattr(game, "action_shape", ()) != ():
            raise ValueError(
                "GymVectorAdapter is single-agent (scalar action per env); "
                "drive MultiPlayerRoom through the batched Env API instead"
            )
        self.num_envs = num_envs
        self._env = Env(
            game, num_envs=num_envs, auto_reset=True,
            reset_budget=reset_budget,
            final_obs_in_info=final_observation,
        )
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self.single_action_space = self._env.action_space
        self.single_observation_space = self._env.observation_space

    def reset(
        self, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k_reset = jax.random.split(self._key)
        self._state, obs = self._env.reset(k_reset)
        return np.asarray(obs), {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        res = self._env.step(
            self._state, jnp.asarray(np.asarray(actions), jnp.int32)
        )
        self._state = res.state
        terminated = np.asarray(res.info["terminated"])
        truncated = np.asarray(res.info["truncated"])
        info = {k: np.asarray(v) for k, v in res.info.items()}
        return (
            np.asarray(res.obs),
            np.asarray(res.reward),
            terminated,
            truncated,
            info,
        )

    def render(self) -> np.ndarray:
        """uint8 RGB frames [N, H, W, 3] of the camera views."""
        from .colors import u32_to_rgb

        return u32_to_rgb(np.asarray(self._env.camera_view(self._state)))

    def close(self) -> None:
        self._state = None
