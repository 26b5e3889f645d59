"""Structural conformance of the frozen legacy v2/v3 locomotion IDs.

Pins obs dims, info keys, option-kwarg surface, and reward conventions to
the reference's mujoco_py-era classes (gymnasium_robotics/envs/mujoco/
*_v{2,3}.py, re-registered at gymnasium_robotics/__init__.py:1123-1261).
"""
import numpy as np
import pytest

from gymnasium_robotics_tpu import registry

# id -> (obs_dim, required info keys)  [reference envs/mujoco/*_v{2,3}.py]
SPECS = {
    "HalfCheetah-v2": (17, {"reward_run", "reward_ctrl"}),
    "HalfCheetah-v3": (
        17, {"x_position", "x_velocity", "reward_run", "reward_ctrl"}),
    "Hopper-v2": (11, set()),
    "Hopper-v3": (11, {"x_position", "x_velocity"}),
    "Walker2d-v2": (17, set()),
    "Walker2d-v3": (17, {"x_position", "x_velocity"}),
    "Swimmer-v2": (8, {"reward_fwd", "reward_ctrl"}),
    "Swimmer-v3": (8, {"reward_fwd", "reward_ctrl", "forward_reward"}),
    # ant v2/v3 observe clipped cfrc_ext for ALL bodies incl world
    # (ant_v2.py:62-68): 13 qpos + 14 qvel + 14*6 cfrc = 111
    "Ant-v2": (111, {"reward_forward", "reward_ctrl", "reward_contact",
                     "reward_survive"}),
    "Ant-v3": (111, {"reward_forward", "reward_survive", "x_position"}),
    # humanoid v2/v3: all-body cinert/cvel/qfrc_actuator/cfrc (376,
    # humanoid_v2.py:26-31)
    "Humanoid-v2": (376, {"reward_linvel", "reward_quadctrl", "reward_alive",
                          "reward_impact"}),
    "Humanoid-v3": (376, {"reward_linvel", "x_position", "forward_reward"}),
    "HumanoidStandup-v2": (376, {"reward_linup", "reward_quadctrl",
                                 "reward_impact"}),
    "Reacher-v2": (11, {"reward_dist", "reward_ctrl"}),
    "Pusher-v2": (23, {"reward_dist", "reward_ctrl"}),
    "InvertedPendulum-v2": (4, set()),
    "InvertedDoublePendulum-v2": (11, set()),
}


@pytest.mark.parametrize("env_id", sorted(SPECS))
def test_legacy_obs_dim_and_info(env_id):
    obs_dim, info_keys = SPECS[env_id]
    env = registry.make_gym(env_id)
    assert env.observation_space.shape == (obs_dim,), env_id
    obs, _ = env.reset(seed=7)
    assert obs.shape == (obs_dim,)
    obs, rew, term, trunc, info = env.step(
        np.zeros(env.action_space.shape, np.float32)
    )
    assert obs.shape == (obs_dim,)
    assert info_keys <= set(info), (env_id, set(info))
    assert np.isfinite(rew)


def test_v3_option_kwargs():
    """v3 envs expose the reference option surface
    (half_cheetah_v3.py:24-90 and siblings)."""
    env = registry.make_gym(
        "HalfCheetah-v3",
        forward_reward_weight=2.0,
        ctrl_cost_weight=0.0,
        exclude_current_positions_from_observation=False,
    )
    assert env.observation_space.shape == (18,)
    env.reset(seed=0)
    _, r_zero_ctrl, _, _, info = env.step(
        np.zeros(env.action_space.shape, np.float32)
    )
    assert info["reward_ctrl"] == 0.0

    env = registry.make_gym("Hopper-v3", terminate_when_unhealthy=False)
    env.reset(seed=0)
    for _ in range(5):
        _, _, term, _, _ = env.step(
            env.action_space.sample().astype(np.float32)
        )
        assert not term

    env = registry.make_gym(
        "Ant-v3", exclude_current_positions_from_observation=False
    )
    assert env.observation_space.shape == (113,)


def test_legacy_reward_conventions():
    """Reacher v2 computes the reward from the PRE-step state
    (reacher_v2.py:25-33): the first step's reward must equal the distance
    at reset, not after stepping."""
    env = registry.make_gym("Reacher-v2")
    obs, _ = env.reset(seed=11)
    d0 = float(np.linalg.norm(obs[-3:]))
    _, rew, _, _, info = env.step(np.zeros(2, np.float32))
    assert abs(float(rew) - (-d0)) < 1e-5
    assert abs(float(info["reward_dist"]) - (-d0)) < 1e-5

    # hopper v2: unconditional alive bonus of 1.0 while running
    env = registry.make_gym("Hopper-v2")
    env.reset(seed=1)
    _, rew, _, _, info = env.step(np.zeros(3, np.float32))
    assert info == {} or isinstance(info, dict)
    assert np.isfinite(rew)
