import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.utils import quaternion as quat


def test_axis_angle_z90():
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2))
    v = jnp.array([1.0, 0.0, 0.0])
    out = np.asarray(quat.rotate(v, q))
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-12)


def test_rotation_preserves_lengths_and_angles():
    key = jax.random.PRNGKey(0)
    q = quat.random_uniform(key)
    v = jnp.array([[1.0, 2.0, 3.0], [-0.5, 0.1, 0.0]])
    out = np.asarray(quat.rotate(v, q))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(np.asarray(v), axis=1), rtol=1e-12)
    np.testing.assert_allclose(out[0] @ out[1],
                               float(v[0] @ v[1]), rtol=1e-10)


def test_qmul_matches_sequential_rotation():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q1 = quat.random_uniform(k1)
    q2 = quat.random_uniform(k2)
    v = jnp.array([0.3, -1.2, 2.0])
    seq = quat.rotate(quat.rotate(v, q1), q2)
    comb = quat.rotate(v, quat.qmul(q2, q1))
    np.testing.assert_allclose(np.asarray(seq), np.asarray(comb), atol=1e-12)


def test_random_uniform_is_unit_and_isotropic():
    q = quat.random_uniform(jax.random.PRNGKey(2), (2000,))
    norms = np.linalg.norm(np.asarray(q), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    # rotating a fixed vector should give mean ~0 by symmetry
    v = jnp.array([0.0, 0.0, 1.0])
    outs = np.asarray(quat.rotate(v, q))
    assert np.abs(outs.mean(axis=0)).max() < 0.05


def test_random_small_angle_bound():
    q = quat.random_small(jax.random.PRNGKey(3), 0.2, (500,))
    angles = 2 * np.arccos(np.clip(np.asarray(q)[:, 0], -1, 1))
    assert angles.max() <= 0.2 + 1e-9
