"""Registry-wide conformance: every registered ID is touched by at least one
test (the reference parametrizes its whole suite over every spec,
tests/utils.py:6-10 + tests/test_envs.py:39-117); shape checks go through
jax.eval_shape so the full sweep never pays XLA compiles, with one trace per
distinct (entry_point, shape-relevant kwargs) signature.
"""

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_robotics_tpu import registry

REF_IDS = (
    (pathlib.Path(__file__).parent / "reference_ids.txt")
    .read_text()
    .split()
)

# kwargs that change computation but never shapes (goal modes all share the
# 7-dim hand goal; reward_type changes the reward op only)
_SHAPE_IRRELEVANT = {"reward_type", "target_position", "target_rotation",
                     "ignore_z_target_rotation"}


def test_reference_ids_all_registered():
    """All 234 reference env IDs (generated from the reference registry at
    /root/reference/gymnasium_robotics/__init__.py) exist here."""
    ours = set(registry.ids())
    missing = sorted(set(REF_IDS) - ours)
    assert not missing, f"missing {len(missing)} reference ids: {missing[:10]}"


def _signature(spec):
    ep = spec.entry_point
    name = getattr(ep, "__qualname__", repr(ep))
    kw = tuple(
        sorted(
            (k, repr(v))
            for k, v in spec.kwargs.items()
            if k not in _SHAPE_IRRELEVANT
        )
    )
    return (getattr(ep, "__module__", ""), name, kw)


def _assert_obs_matches(sd, space, path=""):
    import gymnasium.spaces as S

    if isinstance(space, S.Dict):
        assert set(sd.keys()) == set(space.spaces.keys()), (
            f"{path}: obs keys {sorted(sd)} != space keys "
            f"{sorted(space.spaces)}"
        )
        for k in space.spaces:
            _assert_obs_matches(sd[k], space.spaces[k], f"{path}/{k}")
    else:
        assert tuple(sd.shape) == tuple(space.shape), (
            f"{path}: obs shape {sd.shape} != space shape {space.shape}"
        )


def test_all_ids_construct_spaces_and_obs_shapes():
    """Construct EVERY registered ID; check spaces exist, the action space is
    the documented Box, the episode limit is wired, and (one abstract trace
    per shape signature) env.initial's obs pytree matches observation_space.
    """
    import gymnasium.spaces as S

    traced = {}
    failures = []
    for env_id in registry.ids():
        try:
            spec = registry.spec(env_id)
            env = registry.make(env_id)
            assert env.observation_space is not None, "no observation_space"
            assert isinstance(env.action_space, S.Box), "action space not Box"
            assert env.max_episode_steps is not None, "no max_episode_steps"
            sig = _signature(spec)
            if sig not in traced:
                state_sd = jax.eval_shape(env.initial, jax.random.key(0))
                _assert_obs_matches(state_sd.obs, env.observation_space)
                # reward/flags are scalars
                assert state_sd.reward.shape == ()
                assert state_sd.terminated.shape == ()
                traced[sig] = True
        except Exception as e:  # collect everything, report once
            failures.append((env_id, repr(e)[:200]))
    assert not failures, (
        f"{len(failures)} ids failed: {failures[:8]}"
    )


# one ID per family (+ version variants where semantics differ)
DETERMINISM_REPS = [
    "PointMaze_Medium_Diverse_G-v3",
    "FetchReach-v4",
    "HandReach-v0",
    "AntMaze_UMaze-v5",
    "AdroitHandDoor-v1",
    "FrankaKitchen-v1",
    "HalfCheetah-v5",
]


@pytest.mark.parametrize("env_id", DETERMINISM_REPS)
def test_seeded_determinism_per_family(env_id):
    """Two same-seeded rollouts are bitwise identical (the reference's
    determinism contract, tests/test_envs.py:62-117)."""
    env = registry.make(env_id)
    step = jax.jit(env.step)
    init = jax.jit(env.initial)
    rng = np.random.default_rng(7)
    acts = rng.uniform(-1, 1, (3,) + env.action_space.shape).astype(np.float32)

    def rollout():
        s = init(jax.random.key(123))
        out = []
        for a in acts:
            s = step(s, jnp.asarray(a))
            out.append(
                (jax.device_get(s.obs), float(s.reward),
                 bool(s.terminated), bool(s.truncated))
            )
        return out

    r1, r2 = rollout(), rollout()
    for (o1, rew1, t1, tr1), (o2, rew2, t2, tr2) in zip(r1, r2):
        jax.tree_util.tree_map(np.testing.assert_array_equal, o1, o2)
        assert rew1 == rew2 and t1 == t2 and tr1 == tr2


CHECK_ENV_REPS = [
    "FetchReach-v4",
    "HandReach-v0",
    "AntMaze_UMaze-v5",
    "AdroitHandDoor-v1",
    "FrankaKitchen-v1",
]


@pytest.mark.parametrize("env_id", CHECK_ENV_REPS)
def test_gymnasium_check_env_per_family(env_id):
    """Gymnasium API conformance via the adapter (reference
    tests/test_envs.py:39-53). PointMaze + HalfCheetah covered in
    test_envs_api.py."""
    import warnings

    from gymnasium.utils.env_checker import check_env

    env = registry.make_gym(env_id)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(env, skip_render_check=True)


# --- Kitchen behavioral semantics (reference
# tests/envs/franka_kitchen/test_kitchen_env.py:17-60) ---

def _force_task(state, task):
    from gymnasium_robotics_tpu.envs.kitchen.kitchen import (
        OBS_ELEMENT_GOALS, OBS_ELEMENT_INDICES,
    )

    qpos = state.data.qpos.at[jnp.asarray(OBS_ELEMENT_INDICES[task])].set(
        jnp.asarray(OBS_ELEMENT_GOALS[task], state.data.qpos.dtype)
    )
    return dataclasses.replace(
        state, data=dataclasses.replace(state.data, qpos=qpos)
    )


def test_kitchen_task_completion_semantics():
    env = registry.make(
        "FrankaKitchen-v1", tasks_to_complete=("microwave", "kettle")
    )
    step = jax.jit(env.step)
    s = jax.jit(env.initial)(jax.random.key(0))
    zero = jnp.zeros(9, jnp.float32)

    # force microwave into its goal configuration -> reward 1, task removed
    s = _force_task(s, "microwave")
    s = step(s, zero)
    assert float(s.reward) == 1.0
    tasks = list(env.tasks)
    mi = tasks.index("microwave")
    ki = tasks.index("kettle")
    assert bool(s.info["step_task_completions"][mi])
    assert not bool(s.info["tasks_to_complete"][mi])
    assert bool(s.info["tasks_to_complete"][ki])
    assert not bool(s.terminated)

    # completing it again scores nothing (remove_task_when_completed)
    s2 = step(_force_task(s, "microwave"), zero)
    assert float(s2.reward) == 0.0

    # force the kettle too -> all done, terminated
    s3 = step(_force_task(s2, "kettle"), zero)
    assert float(s3.reward) == 1.0
    assert bool(jnp.all(s3.info["episode_task_completions"]))
    assert bool(s3.terminated)


def test_kitchen_no_termination_when_configured():
    env = registry.make(
        "FrankaKitchen-v1",
        tasks_to_complete=("microwave",),
        terminate_on_tasks_completed=False,
    )
    s = jax.jit(env.initial)(jax.random.key(0))
    s = jax.jit(env.step)(_force_task(s, "microwave"), jnp.zeros(9))
    assert float(s.reward) == 1.0
    assert not bool(s.terminated)


# --- Adroit env-state dict round-trip (reference
# tests/envs/adroit_hand/test_adroit_hammer.py:10-50) ---

ADROIT_REPS = [
    "AdroitHandDoor-v2",
    "AdroitHandHammer-v2",
    "AdroitHandPen-v2",
    "AdroitHandRelocate-v2",
]


@pytest.mark.parametrize("env_id", ADROIT_REPS)
def test_adroit_env_state_roundtrip(env_id):
    env = registry.make(env_id)
    s = jax.jit(env.initial)(jax.random.key(3))
    sd = jax.device_get(env.get_env_state(s))
    assert set(sd) >= {"qpos", "qvel"}

    # mutate, apply, read back
    sd2 = dict(sd)
    sd2["qpos"] = sd["qpos"] + 0.01
    s2 = env.set_env_state(s, sd2)
    rd = jax.device_get(env.get_env_state(s2))
    np.testing.assert_allclose(rd["qpos"], sd2["qpos"], rtol=1e-6)

    # restore the original exactly
    s3 = env.set_env_state(s2, sd)
    rd3 = jax.device_get(env.get_env_state(s3))
    np.testing.assert_array_equal(rd3["qpos"], sd["qpos"])
    np.testing.assert_array_equal(rd3["qvel"], sd["qvel"])
    # obs recomputed consistently with the restored state
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s3.obs)),
        np.asarray(jax.device_get(s.obs)),
        atol=1e-5,
    )


@pytest.mark.parametrize("env_id", ["AdroitHandDoor-v1", "AdroitHandHammer-v2"])
def test_adroit_reset_initial_state_dict(env_id):
    """reset(options={'initial_state_dict': ...}) through the gym adapter
    (reference adroit_door.py:346-357 / tests/envs/adroit_hand/
    test_adroit_hammer.py:10-60): a saved env-state dict injected at reset
    must reproduce the saved observation on a differently-seeded reset."""
    env = registry.make_gym(env_id)
    env.reset(seed=123)
    for _ in range(3):
        env.step(env.action_space.sample())
    saved = env.get_env_state()
    assert set(saved) >= {"qpos", "qvel"}
    # reference baseline: obs after set_env_state (which runs mj_forward,
    # i.e. fresh kinematics — unlike the one-substep-stale stepped obs)
    env.set_env_state(saved)
    obs = np.asarray(jax.device_get(env._state.obs))

    obs2, _ = env.reset(seed=456, options={"initial_state_dict": saved})
    np.testing.assert_allclose(obs2, obs, atol=1e-5)
    restored = env.get_env_state()
    np.testing.assert_allclose(restored["qpos"], saved["qpos"], atol=1e-6)
    np.testing.assert_allclose(restored["qvel"], saved["qvel"], atol=1e-6)

    # a plain differently-seeded reset must NOT reproduce it
    obs3, _ = env.reset(seed=456)
    assert not np.allclose(obs3, obs, atol=1e-5)
