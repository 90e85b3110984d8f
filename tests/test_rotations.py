import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.core import rotations as rot


def random_aa(rng, shape=(64, 3), max_angle=np.pi * 0.95):
    v = rng.normal(size=shape)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    ang = rng.uniform(1e-4, max_angle, size=shape[:-1] + (1,))
    return jnp.asarray(v * ang, dtype=jnp.float32)


def test_axis_angle_matrix_roundtrip(rng):
    aa = random_aa(rng)
    R = rot.axis_angle_to_matrix(aa)
    # orthonormality
    eye = jnp.einsum("...ij,...kj->...ik", R, R, precision="highest")
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    aa2 = rot.matrix_to_axis_angle(R)
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_quat_matrix_consistency(rng):
    aa = random_aa(rng)
    R1 = rot.axis_angle_to_matrix(aa)
    q = rot.axis_angle_to_quat(aa)
    R2 = rot.quat_to_matrix(q)
    np.testing.assert_allclose(R1, R2, atol=1e-5)
    q2 = rot.matrix_to_quat(R1)
    # sign-canonicalized comparison
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1)), 1.0, atol=1e-5)


def test_quat_multiply_matches_matrix_product(rng):
    a = random_aa(rng, (32, 3))
    b = random_aa(rng, (32, 3))
    qa, qb = rot.axis_angle_to_quat(a), rot.axis_angle_to_quat(b)
    Rab = rot.axis_angle_to_matrix(a) @ rot.axis_angle_to_matrix(b)
    q_ab = rot.quat_multiply(qa, qb)
    np.testing.assert_allclose(rot.quat_to_matrix(q_ab), Rab, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    aa = random_aa(rng, (16, 3))
    v = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    q = rot.axis_angle_to_quat(aa)
    R = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(rot.quat_rotate(q, v), jnp.einsum("...ij,...j->...i", R, v), atol=1e-5)


def test_small_angle_stability():
    aa = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    q = rot.axis_angle_to_quat(aa)
    assert not np.any(np.isnan(np.asarray(q)))
    np.testing.assert_allclose(q[1], jnp.asarray([1.0, 0, 0, 0]), atol=1e-6)
    R = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)


def test_rot6d_roundtrip(rng):
    aa = random_aa(rng)
    R = rot.axis_angle_to_matrix(aa)
    x = rot.matrix_to_rot6d(R)
    np.testing.assert_allclose(rot.rot6d_to_matrix(x), R, atol=1e-5)


def test_grad_flows_through_quat_to_matrix(rng):
    aa = random_aa(rng, (4, 3))

    def f(aa):
        return jnp.sum(rot.quat_to_matrix(rot.axis_angle_to_quat(aa)))

    g = jax.grad(f)(aa)
    assert not np.any(np.isnan(np.asarray(g)))


def test_transform_points(rng):
    aa = random_aa(rng, (2, 3))
    R = rot.axis_angle_to_matrix(aa)
    t = jnp.asarray(rng.normal(size=(2, 3)), dtype=jnp.float32)
    M = rot.rt_to_mat4(R, t)
    pts = jnp.asarray(rng.normal(size=(2, 5, 3)), dtype=jnp.float32)
    out = rot.transform_points(M, pts)
    expected = jnp.einsum("bij,bnj->bni", R, pts) + t[:, None]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_euler_identity():
    e = jnp.zeros((3, 3), dtype=jnp.float32)
    np.testing.assert_allclose(rot.euler_to_matrix(e), np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6)


@pytest.mark.parametrize("angle", [0.1, 1.5, 3.0])
def test_quat_to_axis_angle_large(angle):
    aa = jnp.asarray([[angle, 0.0, 0.0]], dtype=jnp.float32)
    q = rot.axis_angle_to_quat(aa)
    np.testing.assert_allclose(rot.quat_to_axis_angle(q), aa, atol=1e-5)
