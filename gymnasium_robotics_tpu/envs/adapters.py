"""Gymnasium-API adapter: wraps a functional env as a stateful single-instance
``gymnasium.Env`` with numpy IO, so code written against the reference
(gym.make -> reset/step, GoalEnv Dict obs contract, seeding via np_random)
runs unchanged against this framework. Mirrors the observable behavior of
gymnasium_robotics/envs/robot_env.py:114-186.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium as gym
except ImportError:  # gymnasium is an install extra, not a hard runtime dep
    gym = None

from gymnasium_robotics_tpu import core


def _to_np(x):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def _cast_to_space(obs, space):
    """Cast device obs (f32) to the declared observation-space dtypes."""
    if gym is None:
        return _to_np(obs)
    import gymnasium.spaces as spaces

    if isinstance(space, spaces.Dict):
        return {k: _cast_to_space(obs[k], space[k]) for k in space.spaces}
    return np.asarray(obs, dtype=space.dtype)


class GymAdapter(gym.Env if gym else object):
    metadata = {"render_modes": [], "render_fps": 25}

    def __init__(self, env: core.FunctionalEnv, render_mode: Optional[str] = None,
                 parity: bool = False):
        self.parity = parity
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.metadata = dict(getattr(env, "metadata", {}) or self.metadata)
        self.render_mode = render_mode
        self._state: Optional[core.EnvState] = None
        self._step = jax.jit(env.step)
        self._initial = jax.jit(env.initial)
        self._seed_counter = 0
        self._render_kin = None
        self._viewer = None
        self._parity_reset = None
        self._parity_step = None

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if gym is not None:
            super().reset(seed=seed)
        if seed is None:
            self._seed_counter += 1
            seed = int(np.random.SeedSequence().entropy % (2 ** 31)) \
                if self.np_random is None else int(self.np_random.integers(2 ** 31))
        self._options = options
        # reference Adroit reset(options={'initial_state_dict': ...})
        # (adroit_door.py:346-357): reset normally, then overwrite the state
        # from the dict and recompute obs.
        init_state_dict = None
        if options and "initial_state_dict" in options:
            options = {k: v for k, v in options.items()
                       if k != "initial_state_dict"}
            init_state_dict = self._options["initial_state_dict"]
        if self.parity:
            # reference-exact RNG parity: replicate the family's NumPy draw
            # order on the host and inject the values (utils/parity.py)
            from gymnasium_robotics_tpu.utils import parity as P

            hook = getattr(self.env, "reset_with_values", None)
            values = (
                P.sample_reset_values(self.env, self.np_random, options)
                if hook is not None else None
            )
            if values is not None:
                base = self._initial(jax.random.key(seed))
                if self._parity_reset is None:
                    self._parity_reset = jax.jit(hook)
                self._state = self._parity_reset(
                    base, jax.tree_util.tree_map(jnp.asarray, values)
                )
                if init_state_dict is not None:
                    self.set_env_state(init_state_dict)
                return (
                    _cast_to_space(self._state.obs, self.observation_space),
                    _to_np(self._state.info),
                )
        if options:
            env_reset = getattr(self.env, "initial_with_options", None)
            if env_reset is not None:
                # options are static (cell indices etc.) -> run untraced
                self._state = env_reset(
                    jax.random.key(seed), _freeze_options(options)
                )
            else:
                self._state = self._initial(jax.random.key(seed))
        else:
            self._state = self._initial(jax.random.key(seed))
        if init_state_dict is not None:
            self.set_env_state(init_state_dict)
        return (
            _cast_to_space(self._state.obs, self.observation_space),
            _to_np(self._state.info),
        )

    def step(self, action):
        if self.parity:
            # families whose reference draws randomness during step (kitchen
            # obs noise, franka_env.py:118-127): inject host-drawn values
            from gymnasium_robotics_tpu.utils import parity as P

            hook = getattr(self.env, "step_with_values", None)
            values = (
                P.sample_step_values(self.env, self.np_random)
                if hook is not None else None
            )
            if values is not None:
                if self._parity_step is None:
                    self._parity_step = jax.jit(hook)
                self._state = self._parity_step(
                    self._state, jnp.asarray(action),
                    jax.tree_util.tree_map(jnp.asarray, values),
                )
            else:
                self._state = self._step(self._state, jnp.asarray(action))
        else:
            self._state = self._step(self._state, jnp.asarray(action))
        s = self._state
        truncated = bool(s.truncated)
        # TimeLimit semantics: the reference registry wraps every env in
        # gymnasium's TimeLimit (max_episode_steps per family,
        # gymnasium_robotics/__init__.py:31,107,...)
        limit = self.env.max_episode_steps
        if limit is not None and int(s.steps) >= limit:
            truncated = True
        if self.render_mode == "human":
            # reference robot_env.py renders every step under human mode
            self.render()
        return (
            _cast_to_space(s.obs, self.observation_space),
            float(s.reward),
            bool(s.terminated),
            truncated,
            _to_np(s.info),
        )

    # GoalEnv contract (numpy in/out)
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        return np.asarray(
            self.env.compute_reward(
                jnp.asarray(achieved_goal), jnp.asarray(desired_goal), info
            )
        )

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        return np.asarray(
            self.env.compute_terminated(
                jnp.asarray(achieved_goal), jnp.asarray(desired_goal), info
            )
        )

    def compute_truncated(self, achieved_goal, desired_goal, info=None):
        return np.asarray(
            self.env.compute_truncated(
                jnp.asarray(achieved_goal), jnp.asarray(desired_goal), info
            )
        )

    def render(self):
        """rgb_array / depth_array frames from the host-side software
        renderer (the reference's MujocoRenderer analogue,
        robot_env.py:282-290); ``human`` displays the rgb frame in an
        interactive window (render/viewer.py), returning None per the
        gymnasium convention."""
        if self.render_mode == "human":
            frame = self._render_frame("rgb_array")
            if frame is not None:
                if self._viewer is None:
                    from gymnasium_robotics_tpu.render.viewer import HumanViewer

                    self._viewer = HumanViewer(
                        fps=self.metadata.get("render_fps", 25)
                    )
                self._viewer.show(frame)
            return None
        return self._render_frame(self.render_mode)

    def _render_frame(self, mode):
        if mode not in ("rgb_array", "depth_array") or self._state is None:
            return None
        data = getattr(self._state, "data", None)
        model = getattr(self.env, "model", None)
        if data is None or model is None:
            return None
        from gymnasium_robotics_tpu.render import renderer as R

        cam = getattr(self.env, "camera_config", None)
        if cam is None:
            fam = type(self.env).__module__.rsplit(".", 2)[-2]
            cam = R.FAMILY_CAMERAS.get(fam)
        import jax as _jax

        # refresh kinematics on a copy: some families leave geom_xpos stale
        # at reset (they only need qpos for obs); rendering must not mutate
        # the stepping state
        if self._render_kin is None:
            from gymnasium_robotics_tpu.physics import smooth

            self._render_kin = _jax.jit(
                lambda dd: smooth.kinematics(self.env.model, dd)
            )
        fresh = self._render_kin(data)
        host = _jax.device_get((fresh.geom_xpos, fresh.geom_xmat))
        return R.render_frame(
            model, host[0], host[1], camera=cam,
            depth=mode == "depth_array",
        )

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    @property
    def unwrapped(self):
        return self

    def __reduce__(self):
        # registry.make_gym envs pickle as their make args and reconstruct a
        # data-equivalent env on load (reference EzPickle contract,
        # tests/test_envs.py:158-172); live episode state is not carried.
        spec = getattr(self, "_make_spec", None)
        if spec is not None:
            from gymnasium_robotics_tpu import registry

            return (registry.remake, (spec,))
        return super().__reduce__()

    # env-state checkpointing (analogue of Adroit get/set_env_state,
    # reference adroit_door.py:373-392; total for every family). Families
    # that define the reference's dict API (Adroit) speak it here too; the
    # full EnvState pytree round-trips everywhere.
    def get_env_state(self):
        fn = getattr(self.env, "get_env_state", None)
        if fn is not None:
            return jax.device_get(fn(self._state))
        return jax.device_get(self._state)

    def set_env_state(self, state):
        fn = getattr(self.env, "set_env_state", None)
        if fn is not None and isinstance(state, dict):
            self._state = fn(self._state, state)
        else:
            self._state = jax.device_put(state)


def _freeze_options(options: dict):
    return {k: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            for k, v in options.items()}
