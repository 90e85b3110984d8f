"""Per-frame avatar deformation (the animation hot loop).

Parity with `Ubody_Gaussian.forward` (ref: ubody_gaussian.py:245-289):
vertex Gaussians ride the EHM-deformed vertices with their rotations
composed with the per-vertex LBS transform; UV Gaussians are re-anchored to
their binding face's TBN frame, position = R_face @ local_xyz * face_scale +
barycentric center, rotation = face_quat o rotation, scale *= face_scale.

Pure jnp; everything batched and jit-clean (the per-frame cost is a handful
of gathers + small einsums — XLA fuses the lot).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bodymodel.ehm import BodyParams, EhmModel, FlameParams, ehm_forward
from ..core.mesh import face_orientation
from ..core.rotations import matrix_to_quat, quat_multiply, quat_normalize
from .state import GaussianAvatar, GaussianSet


def deform_avatar(
    avatar: GaussianAvatar,
    ehm: EhmModel,
    faces: jnp.ndarray,
    body: BodyParams,
    flame: FlameParams | None,
) -> GaussianSet:
    res = ehm_forward(ehm, body, flame)
    return deform_with_vertices(avatar, res.vertices, res.vertex_transforms, faces)


def deform_with_vertices(
    avatar: GaussianAvatar,
    vertices: jnp.ndarray,          # (B, V, 3) deformed EHM vertices
    vertex_transforms: jnp.ndarray,  # (B, V, 4, 4)
    faces: jnp.ndarray,              # (F, 3)
) -> GaussianSet:
    B = vertices.shape[0]

    # ---- vertex set ----
    vtx_xyz = vertices
    d_rot = matrix_to_quat(vertex_transforms[:, :, :3, :3])
    vtx_rot = quat_normalize(quat_multiply(d_rot, avatar.vtx_rotations))

    # ---- uv set ----
    R_face, face_scale = face_orientation(vertices, faces, return_scale=True)
    face_quat = matrix_to_quat(R_face)

    bind = avatar.uv_binding_face
    tri = faces[bind]                                  # (N, 3)
    tri_pts = vertices[:, tri]                         # (B, N, 3, 3)
    centers = jnp.einsum("nk,bnkj->bnj", avatar.uv_face_bary, tri_pts)
    R_nn = R_face[:, bind]                             # (B, N, 3, 3)
    s_nn = face_scale[:, bind]                         # (B, N, 1)

    uv_xyz = jnp.einsum("bnij,bnj->bni", R_nn, avatar.uv_local_xyz) * s_nn + centers
    uv_rot = quat_multiply(face_quat[:, bind], avatar.uv_rotations)
    uv_scale = avatar.uv_scales * s_nn

    # invalid chart texels render as nothing
    uv_op = avatar.uv_opacity * avatar.uv_valid[None, :, None]

    return GaussianSet(
        xyz=jnp.concatenate([vtx_xyz, uv_xyz], axis=1),
        rotation=jnp.concatenate([vtx_rot, uv_rot], axis=1),
        scaling=jnp.concatenate([avatar.vtx_scales, uv_scale], axis=1),
        opacity=jnp.concatenate([avatar.vtx_opacity, uv_op], axis=1),
        colors=jnp.concatenate([avatar.vtx_colors, avatar.uv_colors], axis=1),
    )


def canonical_gaussians(avatar: GaussianAvatar, faces: jnp.ndarray) -> GaussianSet:
    """Canonical-space reconstruction (ref: ubody_gaussian.py:291-313)."""
    B, V = avatar.vtx_positions.shape[:2]
    eye_T = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
    return deform_with_vertices(avatar, avatar.vtx_positions, eye_T, faces)
