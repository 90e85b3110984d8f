"""Facial landmark embeddings: static FAN-51, yaw-dynamic 17-point contour,
MediaPipe-105, and the 203-point set.

Replaces the reference's landmark machinery
(ref: models/modules/smplx/SMPLX.py:139-212 buffer setup,
models/modules/smplx/lbs.py:23-105 `rot_mat_to_euler` +
`find_dynamic_lmk_idx_and_bcoords`, models/modules/flame/lbs.py:36-105 same)
TPU-first: the yaw-bucket lookup is a pure gather over a static LUT so the
whole 68-landmark extraction jits into the forward pass (round/clip/where
instead of data-dependent control flow).

How the dynamic contour works: SMPL-X/FLAME's 17 jaw-contour landmarks slide
across the mesh as the head turns (they track the silhouette, not fixed
vertices). The model ships an LUT with one (face-id, barycentric) row per
degree of head yaw in [-39°, +39°]; at runtime we compose the head kinematic
chain, read the yaw angle, and gather the LUT row.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.lbs import vertices2landmarks
from ..core.rotations import axis_angle_to_matrix

# Pelvis -> spine1/2/3 -> neck -> head, leaf first (ref: SMPLX.py:76)
SMPLX_HEAD_KIN_CHAIN = (15, 12, 9, 6, 3, 0)
# FLAME: walk neck (joint 1) up to the root (ref: FLAME.py:126-131)
FLAME_NECK_KIN_CHAIN = (1, 0)


class LandmarkTables(NamedTuple):
    """Static + dynamic landmark embeddings for one parametric model.

    static_*: the 51 inner-face FAN landmarks (fixed triangles).
    dynamic_*: the yaw LUT — row b holds the 17 contour landmarks for a head
    yaw of bucket b (0..39 = 0°..+39°, 40..78 = -1°..-39°).
    """

    static_faces_idx: jnp.ndarray      # (Ls,) i32
    static_bary_coords: jnp.ndarray    # (Ls, 3) f32
    dynamic_faces_idx: jnp.ndarray     # (79, Ld) i32
    dynamic_bary_coords: jnp.ndarray   # (79, Ld, 3) f32
    head_kin_chain: tuple = SMPLX_HEAD_KIN_CHAIN


class StaticEmbedding(NamedTuple):
    """A fixed (non-yaw-dependent) embedding, e.g. MediaPipe-105 or 203-pt."""

    faces_idx: jnp.ndarray             # (L,) i32
    bary_coords: jnp.ndarray           # (L, 3) f32


def rot_mat_to_yaw(R: jnp.ndarray) -> jnp.ndarray:
    """Y-axis euler angle of (..., 3, 3) rotations (ref: smplx/lbs.py:23-33)."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    return jnp.arctan2(-R[..., 2, 0], sy)


def head_yaw_bucket(full_pose_aa: jnp.ndarray, head_kin_chain) -> jnp.ndarray:
    """(B, J, 3) axis-angle full pose -> (B,) int32 LUT bucket in [0, 78].

    Composes the head kinematic chain (leaf-first list, as in the reference)
    into the absolute head rotation, reads its yaw, and quantizes it with the
    reference's folding: buckets 0..39 are yaws 0..+39°, buckets 40..78 are
    -1..-39°, and |yaw| > 39° clamps to the extreme bucket
    (ref: smplx/lbs.py:87-97)."""
    chain = jnp.asarray(head_kin_chain, jnp.int32)
    aa = full_pose_aa[:, chain]                      # (B, K, 3) leaf first
    rots = axis_angle_to_matrix(aa)                  # (B, K, 3, 3)

    rel = jnp.broadcast_to(jnp.eye(3, dtype=full_pose_aa.dtype),
                           (full_pose_aa.shape[0], 3, 3))
    for i in range(len(head_kin_chain)):             # static unroll
        rel = jnp.einsum("bij,bjk->bik", rots[:, i], rel)

    # note the sign flip: LUT angle = -yaw, clamped above at +39
    y_deg = jnp.round(jnp.clip(-rot_mat_to_yaw(rel) * 180.0 / jnp.pi, None, 39.0))
    y = y_deg.astype(jnp.int32)
    neg_vals = jnp.where(y < -39, 78, 39 - y)
    return jnp.where(y < 0, neg_vals, y)


def dynamic_landmark_tables(
    full_pose_aa: jnp.ndarray, tables: LandmarkTables
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch contour (faces_idx (B, Ld), bary (B, Ld, 3)) via the yaw LUT
    (ref: smplx/lbs.py:37-105 as one gather)."""
    bucket = head_yaw_bucket(full_pose_aa, tables.head_kin_chain)
    return (
        jnp.take(tables.dynamic_faces_idx, bucket, axis=0),
        jnp.take(tables.dynamic_bary_coords, bucket, axis=0),
    )


def face_landmarks_68(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    tables: LandmarkTables,
    full_pose_aa: jnp.ndarray,
) -> jnp.ndarray:
    """FAN-68 landmarks: 17 yaw-dynamic contour points followed by the 51
    static inner-face points (the reference's concat order,
    smplx upstream forward / ref FLAME.py usage). (B, V, 3) -> (B, 68, 3)."""
    dyn_f, dyn_b = dynamic_landmark_tables(full_pose_aa, tables)
    B = vertices.shape[0]
    stat_f = jnp.broadcast_to(tables.static_faces_idx[None], (B,) + tables.static_faces_idx.shape)
    stat_b = jnp.broadcast_to(tables.static_bary_coords[None], (B,) + tables.static_bary_coords.shape)
    lmk_f = jnp.concatenate([dyn_f, stat_f], axis=1)
    lmk_b = jnp.concatenate([dyn_b, stat_b], axis=1)
    return vertices2landmarks(vertices, faces, lmk_f, lmk_b)


def embedded_landmarks(
    vertices: jnp.ndarray, faces: jnp.ndarray, emb: StaticEmbedding
) -> jnp.ndarray:
    """Static embedding extraction (MediaPipe-105 / 203-point sets)."""
    return vertices2landmarks(vertices, faces, emb.faces_idx, emb.bary_coords)


# ---------------------------------------------------------------------------
# loaders (numpy, offline)
# ---------------------------------------------------------------------------


def landmark_tables_from_smplx_npz(ss: dict, head_kin_chain=SMPLX_HEAD_KIN_CHAIN) -> LandmarkTables:
    """Build tables from the SMPL-X model npz keys
    (ref: SMPLX.py:145-150). The npz static table has 51+17 rows in some
    releases; the static part used with the dynamic contour is the last 51."""
    stat_f = np.asarray(ss["lmk_faces_idx"], np.int64).astype(np.int32)
    stat_b = np.asarray(ss["lmk_bary_coords"], np.float32)
    if stat_f.shape[0] == 68:  # drop the static contour; dynamic replaces it
        stat_f, stat_b = stat_f[17:], stat_b[17:]
    return LandmarkTables(
        static_faces_idx=jnp.asarray(stat_f),
        static_bary_coords=jnp.asarray(stat_b),
        dynamic_faces_idx=jnp.asarray(
            np.asarray(ss["dynamic_lmk_faces_idx"], np.int64).astype(np.int32)
        ),
        dynamic_bary_coords=jnp.asarray(
            np.asarray(ss["dynamic_lmk_bary_coords"], np.float32)
        ),
        head_kin_chain=tuple(head_kin_chain),
    )


def landmark_tables_from_flame_npy(path: str) -> tuple[LandmarkTables, StaticEmbedding]:
    """FLAME `landmark_embedding.npy` (a pickled dict; ref: FLAME.py:117-124)
    -> (tables for the 17+51 FAN set, the 68-point `full` static embedding
    used for landmarks3d)."""
    d = np.load(path, allow_pickle=True, encoding="latin1")[()]
    tables = LandmarkTables(
        static_faces_idx=jnp.asarray(
            np.asarray(d["static_lmk_faces_idx"], np.int64).astype(np.int32)
        ),
        static_bary_coords=jnp.asarray(np.asarray(d["static_lmk_bary_coords"], np.float32)),
        dynamic_faces_idx=jnp.asarray(
            np.asarray(d["dynamic_lmk_faces_idx"], np.int64).astype(np.int32)
        ),
        dynamic_bary_coords=jnp.asarray(
            np.asarray(d["dynamic_lmk_bary_coords"], np.float32)
        ),
        head_kin_chain=FLAME_NECK_KIN_CHAIN,
    )
    full = StaticEmbedding(
        faces_idx=jnp.asarray(np.asarray(d["full_lmk_faces_idx"], np.int64).astype(np.int32).reshape(-1)),
        bary_coords=jnp.asarray(np.asarray(d["full_lmk_bary_coords"], np.float32).reshape(-1, 3)),
    )
    return tables, full


def load_mediapipe_embedding(path: str) -> tuple[StaticEmbedding, np.ndarray]:
    """mediapipe_landmark_embedding.npz (ref: SMPLX.py:195-198) ->
    (embedding, landmark_indices into the 478 mediapipe points)."""
    d = np.load(path)
    emb = StaticEmbedding(
        faces_idx=jnp.asarray(np.asarray(d["lmk_face_idx"], np.int64).astype(np.int32)),
        bary_coords=jnp.asarray(np.asarray(d["lmk_b_coords"], np.float32)),
    )
    return emb, np.asarray(d["landmark_indices"])


def load_203_embedding(path: str) -> tuple[StaticEmbedding, dict]:
    """203_landmark_embeding.npz (ref: SMPLX.py:203-212 / FLAME.py:139-148) ->
    (embedding, view-subset index dict)."""
    d = np.load(path)
    emb = StaticEmbedding(
        faces_idx=jnp.asarray(np.asarray(d["lmk_face_idx"], np.int64).astype(np.int32)),
        bary_coords=jnp.asarray(np.asarray(d["lmk_b_coords"], np.float32)),
    )
    subsets = {
        k[len("landmark_"):-len("_indices")]: np.asarray(d[k])
        for k in d.files
        if k.startswith("landmark_") and k.endswith("_indices")
    }
    return emb, subsets


def synthetic_landmark_tables(
    num_faces: int,
    n_static: int = 51,
    n_contour: int = 17,
    head_kin_chain=SMPLX_HEAD_KIN_CHAIN,
    seed: int = 0,
) -> LandmarkTables:
    """Structure-compatible random tables for tests/synthetic rigs."""
    rng = np.random.default_rng(seed)

    def bary(n):
        b = rng.uniform(0.05, 1.0, (n, 3)).astype(np.float32)
        return b / b.sum(-1, keepdims=True)

    return LandmarkTables(
        static_faces_idx=jnp.asarray(rng.integers(0, num_faces, n_static, dtype=np.int32)),
        static_bary_coords=jnp.asarray(bary(n_static)),
        dynamic_faces_idx=jnp.asarray(
            rng.integers(0, num_faces, (79, n_contour), dtype=np.int32)
        ),
        dynamic_bary_coords=jnp.asarray(bary(79 * n_contour).reshape(79, n_contour, 3)),
        head_kin_chain=tuple(head_kin_chain),
    )
