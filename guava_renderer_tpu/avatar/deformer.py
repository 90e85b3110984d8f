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
from ..core.rotations import (
    matrix_to_quat,
    matrix_to_quat_comps,
    quat_multiply,
    quat_multiply_comps,
    quat_normalize,
)
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


def _safe_inv_norm(x, y, z, eps=1e-12):
    return 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)


def deform_with_vertices(
    avatar: GaussianAvatar,
    vertices: jnp.ndarray,          # (B, V, 3) deformed EHM vertices
    vertex_transforms: jnp.ndarray,  # (B, V, 4, 4)
    faces: jnp.ndarray,              # (F, 3)
) -> GaussianSet:
    """All UV-chart math runs on flat (B, N) COMPONENT arrays: stacked
    (B, N, 3, 3)/(B, N, 4) tensors lane-pad their trailing dims ~40x on
    TPU and made this per-frame path cost ~17 ms of the 59 ms frame
    (outputs/bench/tpu_window_20260817_064208/diag.log). The math is
    face_orientation/matrix_to_quat/quat_multiply verbatim, unstacked."""
    B = vertices.shape[0]

    # ---- vertex set (V ~ 21k: the stacked forms stay affordable) ----
    vtx_xyz = vertices
    d_rot = matrix_to_quat(vertex_transforms[:, :, :3, :3])
    vtx_rot = quat_normalize(quat_multiply(d_rot, avatar.vtx_rotations))

    # ---- uv set, component form ----
    bind = avatar.uv_binding_face                      # (N,)
    vx, vy, vz = vertices[..., 0], vertices[..., 1], vertices[..., 2]
    fb0, fb1, fb2 = faces[bind, 0], faces[bind, 1], faces[bind, 2]

    # bound-triangle vertex components (B, N)
    ax, ay, az = vx[:, fb0], vy[:, fb0], vz[:, fb0]
    bx, by, bz = vx[:, fb1], vy[:, fb1], vz[:, fb1]
    cx, cy, cz = vx[:, fb2], vy[:, fb2], vz[:, fb2]

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
    s_nn = (s0 + s1) * 0.5                             # (B, N)

    # face frame R has COLUMNS [t, n, bt] -> rows are the components below
    fw, fx_, fy_, fz_ = matrix_to_quat_comps(
        tx, nx_, ux_, ty, ny_, uy_, tz, nz_, uz_,
    )

    # barycentric center
    u0 = avatar.uv_face_bary[None, :, 0]
    u1 = avatar.uv_face_bary[None, :, 1]
    u2 = avatar.uv_face_bary[None, :, 2]
    ctr_x = u0 * ax + u1 * bx + u2 * cx
    ctr_y = u0 * ay + u1 * by + u2 * cy
    ctr_z = u0 * az + u1 * bz + u2 * cz

    # position = R @ local * s + center  (columns t/n/bt)
    lx = avatar.uv_local_xyz[..., 0]
    ly = avatar.uv_local_xyz[..., 1]
    lz = avatar.uv_local_xyz[..., 2]
    px = (tx * lx + nx_ * ly + ux_ * lz) * s_nn + ctr_x
    py = (ty * lx + ny_ * ly + uy_ * lz) * s_nn + ctr_y
    pz = (tz * lx + nz_ * ly + uz_ * lz) * s_nn + ctr_z
    uv_xyz = jnp.stack([px, py, pz], axis=-1)

    # rotation = face_quat o stored quat
    q = avatar.uv_rotations
    rw, rx, ry, rz = quat_multiply_comps(
        fw, fx_, fy_, fz_, q[..., 0], q[..., 1], q[..., 2], q[..., 3],
    )
    uv_rot = jnp.stack([rw, rx, ry, rz], axis=-1)

    uv_scale = avatar.uv_scales * s_nn[..., None]

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
