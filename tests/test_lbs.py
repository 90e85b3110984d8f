"""LBS golden tests: compare the level-batched JAX chain against a slow,
independently written numpy implementation of the published SMPL equations,
plus hand-checkable analytic cases."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from guava_renderer_tpu.core import lbs


def numpy_lbs_reference(pose_aa, v_template, betas, shapedirs, posedirs, J_reg, parents, weights):
    """Sequential-loop SMPL LBS, written from the paper's equations."""
    B, J = pose_aa.shape[:2]
    V = v_template.shape[0]
    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, J, 3))
    for b in range(B):
        v_shaped = v_template + shapedirs @ betas[b]
        j_rest = J_reg @ v_shaped
        R = Rotation.from_rotvec(pose_aa[b]).as_matrix()  # (J,3,3)
        pf = (R[1:] - np.eye(3)).reshape(-1)
        v_posedirs = v_shaped + (posedirs @ pf).reshape(V, 3) if posedirs is not None else v_shaped
        # chain
        G = np.zeros((J, 4, 4))
        G[0] = np.eye(4)
        G[0][:3, :3] = R[0]
        G[0][:3, 3] = j_rest[0]
        for j in range(1, J):
            L = np.eye(4)
            L[:3, :3] = R[j]
            L[:3, 3] = j_rest[j] - j_rest[parents[j]]
            G[j] = G[parents[j]] @ L
        out_j[b] = G[:, :3, 3]
        A = G.copy()
        for j in range(J):
            A[j][:3, 3] -= A[j][:3, :3] @ j_rest[j]
        for v in range(V):
            T = np.einsum("j,jrc->rc", weights[v], A)
            out_v[b, v] = T[:3, :3] @ v_posedirs[v] + T[:3, 3]
    return out_v, out_j


def make_rig(rng, V=40, J=6, n_betas=4):
    parents = np.array([0, 0, 1, 2, 1, 4])  # small tree, two branches
    v_template = rng.normal(size=(V, 3))
    shapedirs = rng.normal(size=(V, 3, n_betas)) * 0.1
    posedirs_flat = rng.normal(size=(V * 3, (J - 1) * 9)) * 0.01
    J_reg = np.abs(rng.normal(size=(J, V)))
    J_reg /= J_reg.sum(1, keepdims=True)
    weights = np.abs(rng.normal(size=(V, J)))
    weights /= weights.sum(1, keepdims=True)
    return parents, v_template, shapedirs, posedirs_flat, J_reg, weights


def test_lbs_matches_numpy_reference(rng):
    parents, v_template, shapedirs, posedirs_flat, J_reg, weights = make_rig(rng)
    B, J = 3, 6
    pose = rng.normal(size=(B, J, 3)) * 0.4
    betas = rng.normal(size=(B, 4))

    ref_v, ref_j = numpy_lbs_reference(
        pose, v_template, betas, shapedirs, posedirs_flat, J_reg, parents, weights
    )

    res = lbs.lbs(
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(v_template, jnp.float32),
        None,
        parents,
        jnp.asarray(weights, jnp.float32),
        betas=jnp.asarray(betas, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs_flat.reshape(-1, 3, (J - 1) * 9), jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
    )
    np.testing.assert_allclose(res.joints_posed, ref_j, atol=2e-5)
    np.testing.assert_allclose(res.vertices, ref_v, atol=2e-5)


def test_identity_pose_is_identity(rng):
    parents, v_template, shapedirs, posedirs_flat, J_reg, weights = make_rig(rng)
    J = 6
    pose = jnp.zeros((2, J, 3), jnp.float32)
    res = lbs.lbs(
        pose,
        jnp.asarray(v_template, jnp.float32),
        None,
        parents,
        jnp.asarray(weights, jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
    )
    np.testing.assert_allclose(res.vertices, v_template[None].repeat(2, 0), atol=1e-5)
    np.testing.assert_allclose(res.joints_posed, res.joints_rest, atol=1e-5)
    # vertex transforms are identity
    np.testing.assert_allclose(
        res.vertex_transforms, np.broadcast_to(np.eye(4), res.vertex_transforms.shape), atol=1e-5
    )


def test_global_rotation_rotates_everything(rng):
    parents, v_template, _, _, J_reg, weights = make_rig(rng)
    J = 6
    pose = np.zeros((1, J, 3))
    pose[0, 0] = [0, 0, np.pi / 2]  # global: 90 deg about z
    res = lbs.lbs(
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(v_template, jnp.float32),
        None,
        parents,
        jnp.asarray(weights, jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
    )
    Rz = Rotation.from_rotvec([0, 0, np.pi / 2]).as_matrix()
    root = np.asarray(res.joints_rest)[0, 0]
    expected = (v_template - root) @ Rz.T + root
    np.testing.assert_allclose(res.vertices[0], expected, atol=1e-5)


def test_lbs_wobeta_variant_via_precomputed_joints(rng):
    """lbs with joints_rest given = reference lbs_wobeta (flame/lbs.py:255-333)."""
    parents, v_template, shapedirs, _, J_reg, weights = make_rig(rng)
    B, J = 2, 6
    pose = rng.normal(size=(B, J, 3)) * 0.3
    betas = rng.normal(size=(B, 4))
    full = lbs.lbs(
        jnp.asarray(pose, jnp.float32),
        jnp.asarray(v_template, jnp.float32),
        None,
        parents,
        jnp.asarray(weights, jnp.float32),
        betas=jnp.asarray(betas, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
    )
    v_shaped = jnp.asarray(v_template, jnp.float32) + lbs.blend_shapes(
        jnp.asarray(betas, jnp.float32), jnp.asarray(shapedirs, jnp.float32)
    )
    wob = lbs.lbs(
        jnp.asarray(pose, jnp.float32),
        v_shaped,
        full.joints_rest,
        parents,
        jnp.asarray(weights, jnp.float32),
    )
    np.testing.assert_allclose(wob.vertices, full.vertices, atol=1e-5)
    np.testing.assert_allclose(wob.vertex_transforms, full.vertex_transforms, atol=1e-5)


def test_vertices2landmarks(rng):
    V, F, L = 20, 10, 5
    verts = jnp.asarray(rng.normal(size=(2, V, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)), jnp.int32)
    lmk_f = jnp.asarray(rng.integers(0, F, size=(L,)), jnp.int32)
    bary = np.abs(rng.normal(size=(L, 3)))
    bary /= bary.sum(-1, keepdims=True)
    out = lbs.vertices2landmarks(verts, faces, lmk_f, jnp.asarray(bary, jnp.float32))
    vb = np.asarray(verts)
    expected = np.einsum("blvc,lv->blc", vb[:, np.asarray(faces)[np.asarray(lmk_f)]], bary)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_lbs_is_jittable_and_differentiable(rng):
    parents, v_template, shapedirs, _, J_reg, weights = make_rig(rng)

    @jax.jit
    def f(pose):
        res = lbs.lbs(
            pose,
            jnp.asarray(v_template, jnp.float32),
            None,
            parents,
            jnp.asarray(weights, jnp.float32),
            J_regressor=jnp.asarray(J_reg, jnp.float32),
        )
        return jnp.sum(res.vertices**2)

    pose = jnp.asarray(rng.normal(size=(1, 6, 3)) * 0.2, jnp.float32)
    g = jax.grad(f)(pose)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one coordinate
    eps = 1e-3
    dp = jnp.zeros_like(pose).at[0, 2, 1].set(eps)
    fd = (f(pose + dp) - f(pose - dp)) / (2 * eps)
    np.testing.assert_allclose(g[0, 2, 1], fd, rtol=2e-2)
