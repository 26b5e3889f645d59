"""Rotation math parity vs known-good numpy formulas (mirrors the conventions
of the reference utils/rotations.py; see docstrings there for cite lines)."""

import numpy as np
import pytest

import gymnasium_robotics_tpu.utils.rotations as rot


@pytest.fixture(scope="module")
def eulers():
    rng = np.random.default_rng(1)
    return rng.uniform(-3, 3, (64, 3))


def test_euler_quat_mat_roundtrip(eulers):
    q = np.asarray(rot.euler2quat(eulers))
    m = np.asarray(rot.euler2mat(eulers))
    m2 = np.asarray(rot.quat2mat(q))
    assert np.allclose(m, m2, atol=1e-5)
    e2 = np.asarray(rot.quat2euler(q))
    q2 = np.asarray(rot.euler2quat(e2))
    # quaternions equal up to sign
    dot = np.abs(np.sum(q * q2, axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_quat_mul_rotation_composition(eulers):
    qa = np.asarray(rot.euler2quat(eulers))
    qb = np.asarray(rot.euler2quat(eulers[::-1]))
    v = np.array([0.3, -0.2, 0.9])
    lhs = np.asarray(rot.quat_rot_vec(rot.quat_mul(qa[0], qb[0]), v))
    rhs = np.asarray(rot.quat_rot_vec(qa[0], rot.quat_rot_vec(qb[0], v)))
    assert np.allclose(lhs, rhs, atol=1e-5)


def test_normalize_angles():
    a = np.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0])
    out = np.asarray(rot.normalize_angles(a))
    assert np.all(out <= np.pi) and np.all(out >= -np.pi)


def test_parallel_rotations_count():
    assert len(rot.get_parallel_rotations()) == 24


def test_subtract_euler_zero(eulers):
    d = np.asarray(rot.subtract_euler(eulers, eulers))
    assert np.allclose(d, 0.0, atol=1e-5)


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference"),
    reason="reference checkout not mounted",
)
def test_against_reference_implementation(eulers):
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import gymnasium_robotics.utils.rotations as ref
    except Exception:
        pytest.skip("reference import failed")
    q = ref.euler2quat(eulers)
    assert np.allclose(rot.euler2mat(eulers), ref.euler2mat(eulers), atol=1e-5)
    assert np.allclose(rot.euler2quat(eulers), q, atol=1e-5)
    assert np.allclose(rot.quat2mat(q), ref.quat2mat(q), atol=1e-5)
    assert np.allclose(
        rot.mat2euler(rot.euler2mat(eulers)), ref.mat2euler(ref.euler2mat(eulers)),
        atol=1e-5,
    )
