"""Dynamic/static landmark machinery + FLAME extras.

Golden-checks the jitted yaw-LUT contour path against an independent numpy
reimplementation of the reference algorithm (ref: models/modules/smplx/
lbs.py:23-105), and the FLAME texture PCA / teeth graft / position map
against their defining equations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guava_renderer_tpu.bodymodel.landmarks import (
    LandmarkTables,
    SMPLX_HEAD_KIN_CHAIN,
    StaticEmbedding,
    dynamic_landmark_tables,
    embedded_landmarks,
    face_landmarks_68,
    head_yaw_bucket,
    load_203_embedding,
    load_mediapipe_embedding,
    synthetic_landmark_tables,
)


# ---------------------------------------------------------------------------
# numpy reference for the yaw bucket (independent reimplementation of
# ref smplx/lbs.py:23-105)
# ---------------------------------------------------------------------------


def np_rodrigues(aa):
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def np_yaw_bucket(full_pose, chain):
    out = []
    for b in range(full_pose.shape[0]):
        rel = np.eye(3)
        for j in chain:
            rel = np_rodrigues(full_pose[b, j]) @ rel
        sy = np.sqrt(rel[0, 0] ** 2 + rel[1, 0] ** 2)
        yaw = np.arctan2(-rel[2, 0], sy)
        y = int(np.round(np.minimum(-yaw * 180.0 / np.pi, 39.0)))
        if y < 0:
            y = 78 if y < -39 else 39 - y
        out.append(y)
    return np.asarray(out, np.int32)


def make_pose(B, J=55, scale=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(B, J, 3)) * scale).astype(np.float32)


def test_head_yaw_bucket_matches_numpy():
    pose = make_pose(16, scale=0.4, seed=1)
    got = np.asarray(jax.jit(lambda p: head_yaw_bucket(p, SMPLX_HEAD_KIN_CHAIN))(pose))
    want = np_yaw_bucket(pose, SMPLX_HEAD_KIN_CHAIN)
    np.testing.assert_array_equal(got, want)
    assert got.min() >= 0 and got.max() <= 78


def test_head_yaw_bucket_extremes():
    # pure head-yaw poses at known angles, incl. beyond the +-39 deg clamp
    # LUT angle = -yaw: negative head yaw fills buckets 0..39, positive 40..78
    for deg, expect in [(0, 0), (-10, 10), (-39, 39), (-80, 39), (10, 49)]:
        pose = np.zeros((1, 55, 3), np.float32)
        # LUT angle = -yaw; yaw(deg) about +y on the head joint (15)
        pose[0, 15, 1] = np.deg2rad(deg)
        got = int(head_yaw_bucket(jnp.asarray(pose), SMPLX_HEAD_KIN_CHAIN)[0])
        want = int(np_yaw_bucket(pose, SMPLX_HEAD_KIN_CHAIN)[0])
        assert got == want, (deg, got, want)
        if expect is not None:
            assert got == expect, (deg, got, expect)


def test_face_landmarks_68_golden():
    rng = np.random.default_rng(0)
    F, V, B = 40, 30, 3
    faces = rng.integers(0, V, (F, 3), dtype=np.int32)
    verts = rng.normal(size=(B, V, 3)).astype(np.float32)
    tables = synthetic_landmark_tables(F, seed=2)
    pose = make_pose(B, scale=0.5, seed=3)

    lmk = np.asarray(
        jax.jit(lambda v, p: face_landmarks_68(v, jnp.asarray(faces), tables, p))(
            jnp.asarray(verts), jnp.asarray(pose)
        )
    )
    assert lmk.shape == (B, 68, 3)

    buckets = np_yaw_bucket(pose, SMPLX_HEAD_KIN_CHAIN)
    dyn_f = np.asarray(tables.dynamic_faces_idx)
    dyn_b = np.asarray(tables.dynamic_bary_coords)
    stat_f = np.asarray(tables.static_faces_idx)
    stat_b = np.asarray(tables.static_bary_coords)
    for b in range(B):
        lf = np.concatenate([dyn_f[buckets[b]], stat_f])
        lb = np.concatenate([dyn_b[buckets[b]], stat_b])
        tri = verts[b][faces[lf]]          # (68, 3, 3)
        want = np.einsum("lvc,lv->lc", tri, lb)
        np.testing.assert_allclose(lmk[b], want, atol=1e-5)


def test_dynamic_contour_moves_with_yaw():
    rng = np.random.default_rng(4)
    F = 25
    tables = synthetic_landmark_tables(F, seed=5)
    p0 = np.zeros((1, 55, 3), np.float32)
    p1 = p0.copy()
    p1[0, 15, 1] = -0.4  # ~23 deg yaw
    f0, b0 = dynamic_landmark_tables(jnp.asarray(p0), tables)
    f1, b1 = dynamic_landmark_tables(jnp.asarray(p1), tables)
    assert not np.array_equal(np.asarray(f0), np.asarray(f1)) or not np.allclose(
        np.asarray(b0), np.asarray(b1)
    )


def test_embedding_loaders(tmp_path):
    rng = np.random.default_rng(6)
    mp_path = tmp_path / "mediapipe_landmark_embedding.npz"
    np.savez(
        mp_path,
        lmk_face_idx=rng.integers(0, 100, 105),
        lmk_b_coords=rng.uniform(0, 1, (105, 3)),
        landmark_indices=rng.integers(0, 478, 105),
    )
    emb, idx = load_mediapipe_embedding(str(mp_path))
    assert emb.faces_idx.shape == (105,) and emb.bary_coords.shape == (105, 3)
    assert idx.shape == (105,)

    p203 = tmp_path / "203_landmark_embeding.npz"
    np.savez(
        p203,
        lmk_face_idx=rng.integers(0, 100, 203),
        lmk_b_coords=rng.uniform(0, 1, (203, 3)),
        landmark_front_indices=np.arange(60),
        landmark_left_indices=np.arange(60, 120),
        landmark_right_indices=np.arange(120, 203),
    )
    emb2, subsets = load_203_embedding(str(p203))
    assert emb2.faces_idx.shape == (203,)
    assert set(subsets) == {"front", "left", "right"}

    verts = jnp.asarray(rng.normal(size=(2, 50, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 50, (100, 3), dtype=np.int32))
    out = embedded_landmarks(verts, faces, emb)
    assert out.shape == (2, 105, 3)


# ---------------------------------------------------------------------------
# FLAME extras
# ---------------------------------------------------------------------------


def test_flame_texture_decode():
    from guava_renderer_tpu.bodymodel.flame import flame_texture, synthetic_flame_texture

    space = synthetic_flame_texture(size=8, n_pc=4)
    zero = np.asarray(flame_texture(jnp.zeros((2, 4)), space))
    np.testing.assert_allclose(
        zero[0].reshape(-1), np.clip(space.mean, 0, 1), atol=1e-6
    )
    # linearity before clipping: decode(p) - decode(0) == basis @ p
    p = jnp.asarray([[0.5, -0.3, 0.2, 0.1]], jnp.float32)
    got = np.asarray(flame_texture(p, space))[0].reshape(-1)
    want = np.clip(space.mean + space.basis @ np.asarray(p[0]), 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_add_teeth_flame():
    from guava_renderer_tpu.bodymodel.flame import (
        FLAME_JAW_JOINT,
        FLAME_NECK_JOINT,
        add_teeth_flame,
    )
    from guava_renderer_tpu.bodymodel.synthetic import synthetic_model

    # FLAME-like rig: 5 joints; grid must cover the FLAME lip-ring vertex ids
    joints = np.asarray(
        [[0, 0, 0], [0, 0.1, 0], [0, 0.05, 0.05], [-0.03, 0.15, 0.08], [0.03, 0.15, 0.08]],
        np.float32,
    )
    parents = np.asarray([-1, 0, 1, 1, 1], np.int32)
    flame = synthetic_model("flame", n_verts_side=60, joints=joints, parents=parents,
                            n_shape=10, n_exp=5)
    V0 = flame.num_vertices
    tex = np.random.default_rng(0).uniform(0, 1, (V0, 2)).astype(np.float32)
    new, info = add_teeth_flame(
        flame, texcoords=tex, faces_uv_idx=flame.faces.copy(), head_index=None
    )
    n_ring = 15
    assert new.num_vertices == V0 + 8 * n_ring
    # skinning: upper rows -> neck, lower rows -> jaw, one-hot
    w = new.lbs_weights[V0:]
    upper = info["vid_teeth_upper"] - V0
    lower = info["vid_teeth_lower"] - V0
    assert np.all(w[upper, FLAME_NECK_JOINT] == 1.0)
    assert np.all(w[lower, FLAME_JAW_JOINT] == 1.0)
    assert np.all(w.sum(1) == 1.0)
    assert info["head_index"].shape[0] == V0 + 8 * n_ring
    assert info["texcoords"].shape[0] == tex.shape[0] + 8 * n_ring
    # grafted faces index into the new vertex range
    new_faces = new.faces[flame.faces.shape[0]:]
    assert new_faces.min() >= V0 and new_faces.max() < new.num_vertices


def test_template_position_map():
    from guava_renderer_tpu.bodymodel.data import template_position_map

    v = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32
    )
    faces = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)
    f_idx = np.asarray([[0, 1], [-1, 0]], np.int32)
    mask = f_idx >= 0
    pm = template_position_map(v, faces, f_idx, mask)
    np.testing.assert_allclose(pm[0, 0], v[[0, 1, 2]].mean(0), atol=1e-6)
    np.testing.assert_allclose(pm[0, 1], v[[1, 2, 3]].mean(0), atol=1e-6)
    np.testing.assert_allclose(pm[1, 0], 0.0)


def test_flame_landmark_npy_loader(tmp_path):
    from guava_renderer_tpu.bodymodel.landmarks import landmark_tables_from_flame_npy

    rng = np.random.default_rng(7)
    d = {
        "static_lmk_faces_idx": rng.integers(0, 100, 51),
        "static_lmk_bary_coords": rng.uniform(0, 1, (51, 3)),
        "dynamic_lmk_faces_idx": rng.integers(0, 100, (79, 17)),
        "dynamic_lmk_bary_coords": rng.uniform(0, 1, (79, 17, 3)),
        "full_lmk_faces_idx": rng.integers(0, 100, (1, 68)),
        "full_lmk_bary_coords": rng.uniform(0, 1, (1, 68, 3)),
    }
    path = tmp_path / "landmark_embedding.npy"
    np.save(path, d, allow_pickle=True)
    tables, full = landmark_tables_from_flame_npy(str(path))
    assert tables.dynamic_faces_idx.shape == (79, 17)
    assert tables.head_kin_chain == (1, 0)
    assert full.faces_idx.shape == (68,) and full.bary_coords.shape == (68, 3)
