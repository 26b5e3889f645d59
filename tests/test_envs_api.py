"""Registry-wide API tests, mirroring the reference suite's structure
(tests/test_envs.py: check_env conformance :39-53, seeded determinism :62-117)."""

import numpy as np
import pytest

import jax

from gymnasium_robotics_tpu import registry


def _sample_ids(prefixes, k=4):
    out = []
    for pid in registry.ids():
        if any(pid.startswith(p) for p in prefixes):
            out.append(pid)
    # cap runtime: a representative sample per family
    return out[:k] + out[-2:]


POINT_IDS = ["PointMaze_UMaze-v3", "PointMaze_UMazeDense-v3", "PointMaze_Open_Diverse_GR-v3"]


@pytest.mark.parametrize("env_id", POINT_IDS)
def test_goalenv_obs_contract(env_id):
    env = registry.make(env_id, num_envs=4)
    obs, info = env.reset(seed=0)
    for key in ("observation", "achieved_goal", "desired_goal"):
        assert key in obs, f"GoalEnv dict obs must contain {key}"
    assert obs["achieved_goal"].shape == (4, 2)


@pytest.mark.parametrize("env_id", POINT_IDS)
def test_seeded_determinism(env_id):
    """Two same-seeded batched envs stay bitwise identical over 50 steps
    (the reference's determinism contract, tests/test_envs.py:62-117)."""
    rng = np.random.default_rng(42)
    actions = rng.uniform(-1, 1, (50, 2, 2)).astype(np.float32)

    def rollout():
        env = registry.make(env_id, num_envs=2)
        obs, _ = env.reset(seed=123)
        traj = [obs["observation"]]
        rewards = []
        for a in actions:
            obs, r, te, tr, info = env.step(a)
            traj.append(obs["observation"])
            rewards.append(r)
        return np.asarray(jax.device_get(traj)), np.asarray(jax.device_get(rewards))

    t1, r1 = rollout()
    t2, r2 = rollout()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(r1, r2)


def test_her_relabeling_contract():
    """reward == compute_reward(achieved, desired) after substitution — the
    HER contract (reference README 'Multi-goal API' + core.py:46-66)."""
    env = registry.make("PointMaze_UMazeDense-v3", num_envs=8)
    obs, _ = env.reset(seed=1)
    a = np.zeros((8, 2), np.float32)
    obs, reward, te, tr, info = env.step(a)
    recomputed = env.compute_reward(obs["achieved_goal"], obs["desired_goal"])
    np.testing.assert_allclose(np.asarray(reward), np.asarray(recomputed), atol=1e-6)
    # substituted goals change the reward consistently
    swapped = env.compute_reward(obs["achieved_goal"], obs["achieved_goal"])
    np.testing.assert_allclose(np.asarray(swapped), 1.0, atol=1e-6)


def test_gym_adapter_check_env():
    gym = pytest.importorskip("gymnasium")
    from gymnasium.utils.env_checker import check_env

    env = registry.make_gym("PointMaze_UMaze-v3")
    # obs dtype is float32 on device; relax the checker's strictness by
    # exercising the API manually plus core checker pieces
    obs, info = env.reset(seed=7)
    assert env.observation_space["observation"].shape == (4,)
    o2, r, te, tr, info = env.step(env.action_space.sample())
    assert isinstance(r, float) and isinstance(te, bool) and isinstance(tr, bool)
    # env-state checkpoint round-trip (analogue of Adroit get/set_env_state)
    s = env.get_env_state()
    o3, r3, *_ = env.step(np.zeros(2, np.float32))
    env.set_env_state(s)
    o4, r4, *_ = env.step(np.zeros(2, np.float32))
    np.testing.assert_allclose(o3["observation"], o4["observation"], atol=1e-6)


def test_timelimit_autoreset():
    env_id = "PointMaze_UMaze-v3"
    env = registry.make(env_id, num_envs=2)
    env.reset(seed=0)
    spec = registry.spec(env_id)
    a = np.zeros((2, 2), np.float32)
    truncs = []
    for i in range(spec.max_episode_steps + 2):
        obs, r, te, tr, info = env.step(a)
        truncs.append(np.asarray(tr))
    truncs = np.stack(truncs)
    assert truncs.any(), "episodes must truncate at max_episode_steps"
    # after truncation the env auto-reset: steps counter restarted, so the
    # step right after a truncation must not truncate again
    idx = int(np.argmax(truncs[:, 0]))
    if idx + 1 < len(truncs):
        assert not truncs[idx + 1, 0]


def test_registry_ids_registered():
    ids = registry.ids()
    assert len([i for i in ids if i.startswith("PointMaze")]) == 20


def test_sharded_rollout_cpu_mesh():
    """Scan rollout with the env batch sharded over the 8-device CPU mesh
    (the framework's DP axis; SURVEY.md §2.4)."""
    from gymnasium_robotics_tpu.parallel import rollout as R

    mesh = R.make_mesh(8)
    sharding = R.env_sharding(mesh)
    env = registry.make("PointMaze_UMaze-v3")
    state, traj = R.rollout(env, num_envs=64, num_steps=10, sharding=sharding)
    assert traj["reward"].shape == (10, 64)
    assert np.isfinite(np.asarray(traj["obs"]["observation"])).all()


@pytest.mark.parametrize("env_id", ["PointMaze_UMaze-v3", "HalfCheetah-v5"])
def test_gymnasium_check_env(env_id):
    """Full Gymnasium conformance through the adapter (the reference's
    registry-wide check, tests/test_envs.py:39-53)."""
    import warnings

    gym = pytest.importorskip("gymnasium")
    from gymnasium.utils.env_checker import check_env

    env = registry.make_gym(env_id)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(env, skip_render_check=True)


def test_her_relabel_on_device():
    """HER relabeling over a collected rollout, fully on device."""
    from gymnasium_robotics_tpu.parallel import her, rollout as R

    env = registry.make("PointMaze_UMazeDense-v3")
    state, traj = R.rollout(env, num_envs=8, num_steps=20)
    new_obs, new_rew = her.relabel(
        traj["obs"], traj["reward"], jax.random.key(0),
        compute_reward=env.compute_reward, strategy="final",
    )
    assert new_rew.shape == (20, 8)
    # final-strategy: the last step's relabeled reward equals the reward of
    # achieving one's own goal (dense exp(-0) == 1)
    np.testing.assert_allclose(np.asarray(new_rew[-1]), 1.0, atol=1e-5)


def test_checkpoint_resume_bitwise():
    """Checkpoint/resume (SURVEY §5): a saved EnvState resumes to a bitwise-
    identical rollout (rng keys round-trip through key_data)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.parallel import checkpoint as CK

    env = registry.make("PointMaze_UMaze-v3", num_envs=8)
    env.reset(0)
    a = np.zeros((8,) + env.action_space.shape, np.float32)
    for _ in range(3):
        env.step(a)
    state = env.state
    with tempfile.TemporaryDirectory() as td:
        path = td + "/ck"
        CK.save_state(state, path)
        restored = CK.restore_state(state, path)
    # continue both and compare
    s1 = env.step_state(state, jnp.asarray(a))
    s2 = env.step_state(restored, jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(s1.data.qpos), np.asarray(s2.data.qpos))
    np.testing.assert_array_equal(
        jax.random.key_data(s1.rng), jax.random.key_data(s2.rng)
    )


def test_render_rgb_array():
    """Software renderer produces real frames through the gym adapter
    (reference render_modes contract, robot_env.py:282-290)."""
    import numpy as np

    from gymnasium_robotics_tpu import registry

    env = registry.make_gym("PointMaze_UMaze-v3")
    env.render_mode = "rgb_array"
    assert "rgb_array" in env.metadata["render_modes"]
    env.reset(seed=0)
    f1 = env.render()
    assert f1.shape == (480, 480, 3) and f1.dtype == np.uint8
    # scene has depth: many distinct shades, not a flat fill
    assert len(np.unique(f1.reshape(-1, 3), axis=0)) > 10
    env.step(np.array([1.0, 0.0], np.float32))
    for _ in range(10):
        env.step(np.array([1.0, 0.0], np.float32))
    f2 = env.render()
    assert (f1 != f2).any(), "frame did not change after motion"


def test_render_depth_array():
    """depth_array mode returns a normalized float32 z-buffer (the
    MujocoRenderer depth readback analogue, reference robot_env.py:282-290)
    and every family advertises both offscreen modes."""
    import numpy as np

    from gymnasium_robotics_tpu import registry

    env = registry.make_gym("PointMaze_UMaze-v3")
    env.render_mode = "depth_array"
    assert "depth_array" in env.metadata["render_modes"]
    env.reset(seed=0)
    d = env.render()
    assert d.shape == (480, 480) and d.dtype == np.float32
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
    # scene has structure: foreground strictly nearer than background
    assert float(d.min()) < float(d.max())

    for eid in ["FetchReach-v4", "AdroitHandDoor-v1", "FrankaKitchen-v1",
                "HandReach-v0", "AntMaze_UMaze-v5", "HalfCheetah-v3"]:
        env = registry.make_gym(eid)
        assert "depth_array" in env.metadata["render_modes"], eid


def test_render_human_mode():
    """`human` mode renders every step through the HumanViewer (reference
    robot_env.py renders in step under human mode) and returns None per the
    gymnasium convention; headless (Agg backend) it degrades to buffering
    the latest frame instead of raising."""
    import matplotlib
    import numpy as np

    matplotlib.use("Agg", force=True)
    from gymnasium_robotics_tpu import registry

    env = registry.make_gym("PointMaze_UMaze-v3", render_mode="human")
    assert "human" in env.metadata["render_modes"]
    env.reset(seed=0)
    assert env.render() is None
    env.step(np.array([1.0, 0.0], np.float32))
    viewer = env.unwrapped._viewer
    assert viewer is not None and viewer.last_frame is not None
    assert viewer.last_frame.shape == (480, 480, 3)
    env.close()


@pytest.mark.parametrize(
    "env_id", ["PointMaze_UMaze-v3", "FetchReach-v4", "AdroitHandDoor-v1"]
)
def test_pickle_roundtrip_gym(env_id):
    """Pickle -> unpickle -> identical seeded rollout (the reference EzPickles
    every env and checks data-equivalent reconstruction,
    tests/test_envs.py:158-172)."""
    import pickle

    env = registry.make_gym(env_id)
    env2 = pickle.loads(pickle.dumps(env))
    assert type(env2) is type(env)
    assert env2.observation_space == env.observation_space
    assert env2.action_space == env.action_space

    def rollout(e):
        obs, _ = e.reset(seed=7)
        frames = [obs]
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = rng.uniform(-1, 1, e.action_space.shape).astype(np.float32)
            obs, r, term, trunc, _ = e.step(a)
            frames.append(obs)
        return frames

    for a, b in zip(rollout(env), rollout(env2)):
        jax.tree_util.tree_map(np.testing.assert_array_equal, a, b)


def test_pickle_roundtrip_functional_and_batched():
    import pickle

    env = registry.make("PointMaze_UMaze-v3")
    env2 = pickle.loads(pickle.dumps(env))
    s1 = jax.jit(env.initial)(jax.random.key(5))
    s2 = jax.jit(env2.initial)(jax.random.key(5))
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        s1.obs, s2.obs,
    )

    benv = registry.make("PointMaze_UMaze-v3", num_envs=4)
    benv2 = pickle.loads(pickle.dumps(benv))
    assert benv2.num_envs == 4
    o1, _ = benv.reset(seed=3)
    o2, _ = benv2.reset(seed=3)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        o1, o2,
    )
