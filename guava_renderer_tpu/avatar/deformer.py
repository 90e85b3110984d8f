"""Per-frame avatar deformation (the animation hot loop).

Parity with `Ubody_Gaussian.forward` (ref: ubody_gaussian.py:245-289):
vertex Gaussians ride the EHM-deformed vertices with their rotations
composed with the per-vertex LBS transform; UV Gaussians are re-anchored to
their binding face's TBN frame, position = R_face @ local_xyz * face_scale +
barycentric center, rotation = face_quat o rotation, scale *= face_scale.

Two UV gather paths share the same component math:
  * default (training / arbitrary order): one XLA (B, N, 16) row gather of
    the face table by binding face — fully differentiable end to end.
  * planned (inference hot loop): texels statically sorted by compact
    binding face (ops/facegather.FaceSortPlan); the gather runs as the
    windowed one-hot MXU kernel (~20 ns/row XLA gather -> MXU matmuls).
    Requires a face-sorted avatar (sort_avatar_by_plan) and B == 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..bodymodel.ehm import BodyParams, EhmModel, FlameParams, ehm_forward
from ..core.rotations import (
    matrix_to_quat,
    matrix_to_quat_comps,
    quat_multiply,
    quat_multiply_comps,
    quat_normalize,
)
from ..ops.facegather import FaceSortPlan, face_window_gather
from .state import GaussianAvatar, GaussianSet


def deform_avatar(
    avatar: GaussianAvatar,
    ehm: EhmModel,
    faces: jnp.ndarray,
    body: BodyParams,
    flame: FlameParams | None,
    plan: FaceSortPlan | None = None,
    compact_faces: jnp.ndarray | None = None,
) -> GaussianSet:
    res = ehm_forward(ehm, body, flame)
    return deform_with_vertices(
        avatar, res.vertices, res.vertex_transforms, faces,
        plan=plan, compact_faces=compact_faces,
    )


def sort_avatar_by_plan(avatar: GaussianAvatar, plan: FaceSortPlan) -> GaussianAvatar:
    """Reorder the UV set into the plan's face-sorted texel order.

    Applied ONCE per avatar (the permutation is a static array); rendering
    is order-independent up to depth-tie blending order.
    """
    perm = plan.perm
    return avatar._replace(
        uv_local_xyz=avatar.uv_local_xyz[:, perm],
        uv_colors=avatar.uv_colors[:, perm],
        uv_opacity=avatar.uv_opacity[:, perm],
        uv_scales=avatar.uv_scales[:, perm],
        uv_rotations=avatar.uv_rotations[:, perm],
        uv_binding_face=avatar.uv_binding_face[perm],
        uv_face_bary=avatar.uv_face_bary[perm],
        uv_valid=avatar.uv_valid[perm],
    )


def _safe_inv_norm(x, y, z, eps=1e-12):
    return 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)


def _face_table_components(tri):
    """Triangle corners (..., 3 corners, 3) -> 14 face-frame components.

    Returns (fw, fx, fy, fz, fs, ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z):
    the face frame R = [t, n, bt] carried as a unit quat, the isotropic
    face scale, corner a, and the two edges (parity: compute_face_orientation,
    ref: utils/graphics_utils.py:61-80).
    """
    ax, ay, az = tri[..., 0, 0], tri[..., 0, 1], tri[..., 0, 2]
    bx, by, bz = tri[..., 1, 0], tri[..., 1, 1], tri[..., 1, 2]
    cx, cy, cz = tri[..., 2, 0], tri[..., 2, 1], tri[..., 2, 2]

    # tangent t = normalize(b - a); e2 = c - a
    e1x, e1y, e1z = bx - ax, by - ay, bz - az
    inv = _safe_inv_norm(e1x, e1y, e1z)
    tx, ty, tz = e1x * inv, e1y * inv, e1z * inv
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
    # normal n = normalize(t x e2)
    nx_, ny_, nz_ = (
        ty * e2z - tz * e2y, tz * e2x - tx * e2z, tx * e2y - ty * e2x,
    )
    inv = _safe_inv_norm(nx_, ny_, nz_)
    nx_, ny_, nz_ = nx_ * inv, ny_ * inv, nz_ * inv
    # bitangent bt = -normalize(n x t)
    ux_, uy_, uz_ = (
        ny_ * tz - nz_ * ty, nz_ * tx - nx_ * tz, nx_ * ty - ny_ * tx,
    )
    inv = _safe_inv_norm(ux_, uy_, uz_)
    ux_, uy_, uz_ = -ux_ * inv, -uy_ * inv, -uz_ * inv

    # isotropic face scale = (|e1| + |dot(bt, e2)|) / 2
    s0 = jnp.sqrt(e1x * e1x + e1y * e1y + e1z * e1z)
    s1 = jnp.abs(ux_ * e2x + uy_ * e2y + uz_ * e2z)
    fs = (s0 + s1) * 0.5

    # face frame R has COLUMNS [t, n, bt]; carry it as a unit quat (4
    # channels instead of 9 keeps the table one 16-lane row)
    fw, fx_, fy_, fz_ = matrix_to_quat_comps(
        tx, nx_, ux_, ty, ny_, uy_, tz, nz_, uz_,
    )
    return fw, fx_, fy_, fz_, fs, ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z


def _uv_from_rows(avatar, qw, qx, qy, qz, s_nn, ax, ay, az,
                  e1x, e1y, e1z, e2x, e2y, e2z):
    """Per-texel component math shared by both gather paths.

    All row components and the returned arrays are (B, N)-broadcastable.
    """
    # unit quat -> rotation matrix components (columns t, n, bt)
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)

    # barycentric center: u0*a + u1*b + u2*c == (u0+u1+u2)*a + u1*e1 + u2*e2
    u0 = avatar.uv_face_bary[None, :, 0]
    u1 = avatar.uv_face_bary[None, :, 1]
    u2 = avatar.uv_face_bary[None, :, 2]
    us = u0 + u1 + u2
    ctr_x = us * ax + u1 * e1x + u2 * e2x
    ctr_y = us * ay + u1 * e1y + u2 * e2y
    ctr_z = us * az + u1 * e1z + u2 * e2z

    # position = R @ local * s + center
    lx = avatar.uv_local_xyz[..., 0]
    ly = avatar.uv_local_xyz[..., 1]
    lz = avatar.uv_local_xyz[..., 2]
    px = (r00 * lx + r01 * ly + r02 * lz) * s_nn + ctr_x
    py = (r10 * lx + r11 * ly + r12 * lz) * s_nn + ctr_y
    pz = (r20 * lx + r21 * ly + r22 * lz) * s_nn + ctr_z
    uv_xyz = jnp.stack([px, py, pz], axis=-1)

    # rotation = face_quat o stored quat
    q = avatar.uv_rotations
    rw, rx, ry, rz = quat_multiply_comps(
        qw, qx, qy, qz, q[..., 0], q[..., 1], q[..., 2], q[..., 3],
    )
    uv_rot = jnp.stack([rw, rx, ry, rz], axis=-1)

    uv_scale = avatar.uv_scales * s_nn[..., None]

    # invalid chart texels render as nothing
    uv_op = avatar.uv_opacity * avatar.uv_valid[None, :, None]
    return uv_xyz, uv_rot, uv_scale, uv_op


def deform_with_vertices(
    avatar: GaussianAvatar,
    vertices: jnp.ndarray,          # (B, V, 3) deformed EHM vertices
    vertex_transforms: jnp.ndarray,  # (B, V, 4, 4)
    faces: jnp.ndarray,              # (F, 3)
    plan: FaceSortPlan | None = None,
    compact_faces: jnp.ndarray | None = None,
) -> GaussianSet:
    """UV-chart deformation, face-table factorized for TPU.

    TPU gathers cost ~20 ns/ROW regardless of row width (tools/
    gather_probe.py: one (N,) scalar gather 5.8 ms == one (N,16) row
    gather 5.4 ms at N=262k), so the per-texel math is reorganized to
    need exactly ONE texel-sized gather:

      1. per-FACE (F ~ 27k, ~10x smaller than N texels): gather the
         triangle corners, build the TBN frame, convert it to a quat,
         compute the isotropic face scale, and pack quat/scale/corner/
         edges into a 16-channel face table;
      2. per-TEXEL: one (B, N, 16) row gather of that table by the
         static binding-face index (or, with a FaceSortPlan, the
         windowed one-hot MXU kernel at a fraction of the cost), then
         pure VPU component math.

    Math parity with the stacked spec (face_orientation + matrix_to_quat
    + quat_multiply) is pinned by test_deform_component_form_matches_
    stacked_spec; ref: models/UbodyAvatar/ubody_gaussian.py:245-289.
    The planned path requires B == 1 and a face-sorted avatar; its
    table gradient is exact (custom_vjp), but training keeps the XLA
    path (the scatter-add back into vertices lowers poorly on TPU).
    """
    B = vertices.shape[0]

    # ---- vertex set (V ~ 21k: the stacked forms stay affordable) ----
    vtx_xyz = vertices
    d_rot = matrix_to_quat(vertex_transforms[:, :, :3, :3])
    vtx_rot = quat_normalize(quat_multiply(d_rot, avatar.vtx_rotations))

    if plan is not None:
        assert B == 1, "planned deformation path is single-identity"
        assert compact_faces is not None, "pass compact_faces with the plan"
        tri = vertices[0, compact_faces.reshape(-1)].reshape(-1, 3, 3)
        comps = _face_table_components(tri)            # 14 x (Fc,)
        ftable = jnp.stack(
            list(comps) + [jnp.zeros_like(comps[4])] * 2, axis=-1
        )                                              # (Fc, 16)
        rows16 = face_window_gather(
            ftable, jnp.asarray(plan.compact_ids), plan
        )                                              # (16, N) channel-major
        rowc = [rows16[c][None] for c in range(14)]    # (1, N) each
    else:
        F = faces.shape[0]
        tri = vertices[:, faces.reshape(-1)].reshape(B, F, 3, 3)
        comps = _face_table_components(tri)            # 14 x (B, F)
        ftable = jnp.stack(
            list(comps) + [jnp.zeros_like(comps[4])] * 2, axis=-1,
        )                                              # (B, F, 16)
        rows = ftable[:, avatar.uv_binding_face]       # (B, N, 16)
        rowc = [rows[..., c] for c in range(14)]

    uv_xyz, uv_rot, uv_scale, uv_op = _uv_from_rows(avatar, *rowc)

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
