"""Batched rotation algebra (pure jnp, fully jit/vmap-clean).

Capability parity with the reference's rotation suite
(ref: utils/rotation_converter.py:59-568 and roma quaternion ops used in
models/UbodyAvatar/ubody_gaussian.py:252-254), redesigned as stateless
float32 array functions. Quaternions are **wxyz** (scalar first), matching
the Gaussian rasterizer contract
(ref: submodules/diff-gaussian-rasterization-32/cuda_rasterizer/forward.cu:114-148).

All functions accept arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# axis-angle
# --------------------------------------------------------------------------

def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. aa: (..., 3) -> (..., 3, 3)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)  # (...,1)
    axis = aa / jnp.maximum(angle, _EPS)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (...,3,3)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return eye + s * K + (1.0 - c) * KK


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """aa: (..., 3) -> unit quaternion (..., 4) wxyz."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc form is stable at angle -> 0
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    w = jnp.cos(half)
    xyz = aa * k
    return jnp.concatenate([w, xyz], axis=-1)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    return quat_to_axis_angle(matrix_to_quat(R))


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """q: (..., 4) wxyz -> (..., 3)."""
    q = quat_normalize(q)
    # force w >= 0 for the shortest arc
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)[..., None]
    scale = jnp.where(norm < 1e-8, 2.0, angle / jnp.maximum(norm, _EPS))
    return xyz * scale


# --------------------------------------------------------------------------
# quaternion
# --------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply_comps(aw, ax, ay, az, bw, bx, by, bz):
    """Hamilton product on component arrays (see matrix_to_quat_comps)."""
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz. (..., 4) x (..., 4) -> (..., 4)."""
    w, x, y, z = quat_multiply_comps(
        a[..., 0], a[..., 1], a[..., 2], a[..., 3],
        b[..., 0], b[..., 1], b[..., 2], b[..., 3],
    )
    return jnp.stack([w, x, y, z], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """q: (..., 4) wxyz (normalized inside) -> (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def matrix_to_quat_comps(m00, m01, m02, m10, m11, m12, m20, m21, m22):
    """Component form of matrix_to_quat: nine (...,) arrays -> four (...,)
    arrays (w, x, y, z). On TPU the stacked (..., 3, 3)/(..., 4, 4) layouts
    lane-pad their trailing dims ~40x; large-N callers (the per-frame
    deformer over the 262k-splat UV chart) keep everything in flat
    component arrays instead."""
    t0 = 1 + m00 + m11 + m22
    t1 = 1 + m00 - m11 - m22
    t2 = 1 - m00 + m11 - m22
    t3 = 1 - m00 - m11 + m22

    # Four candidate quaternions, each numerically good in one regime.
    cands = (
        (t0, m21 - m12, m02 - m20, m10 - m01),
        (m21 - m12, t1, m01 + m10, m02 + m20),
        (m02 - m20, m01 + m10, t2, m12 + m21),
        (m10 - m01, m02 + m20, m12 + m21, t3),
    )
    best01 = t0 >= t1
    best23 = t2 >= t3
    tmax01 = jnp.where(best01, t0, t1)
    tmax23 = jnp.where(best23, t2, t3)
    front = tmax01 >= tmax23

    def sel(k):
        a = jnp.where(best01, cands[0][k], cands[1][k])
        b = jnp.where(best23, cands[2][k], cands[3][k])
        return jnp.where(front, a, b)

    w, x, y, z = sel(0), sel(1), sel(2), sel(3)
    inv = 1.0 / jnp.maximum(jnp.sqrt(w * w + x * x + y * y + z * z), _EPS)
    w, x, y, z = w * inv, x * inv, y * inv, z * inv
    neg = w < 0
    return (
        jnp.where(neg, -w, w),
        jnp.where(neg, -x, x),
        jnp.where(neg, -y, y),
        jnp.where(neg, -z, z),
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """R: (..., 3, 3) -> (..., 4) wxyz. Branchless Shepperd's method."""
    w, x, y, z = matrix_to_quat_comps(
        R[..., 0, 0], R[..., 0, 1], R[..., 0, 2],
        R[..., 1, 0], R[..., 1, 1], R[..., 1, 2],
        R[..., 2, 0], R[..., 2, 1], R[..., 2, 2],
    )
    return jnp.stack([w, x, y, z], axis=-1)


# --------------------------------------------------------------------------
# continuous 6D representation (Zhou et al.)
# --------------------------------------------------------------------------

def rot6d_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., 6) -> (..., 3, 3) via Gram-Schmidt on two column vectors."""
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


# --------------------------------------------------------------------------
# euler (XYZ intrinsic), used by motion retargeting paths
# --------------------------------------------------------------------------

def euler_to_matrix(e: jnp.ndarray) -> jnp.ndarray:
    """e: (..., 3) radians, applied as Rz @ Ry @ Rx."""
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    Rx = _stack33(one, zero, zero, zero, cx, -sx, zero, sx, cx)
    Ry = _stack33(cy, zero, sy, zero, one, zero, -sy, zero, cy)
    Rz = _stack33(cz, -sz, zero, sz, cz, zero, zero, zero, one)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Rz, Ry, precision=hi), Rx, precision=hi)


def _stack33(*vals):
    rows = [jnp.stack(vals[i * 3 : i * 3 + 3], axis=-1) for i in range(3)]
    return jnp.stack(rows, axis=-2)


# --------------------------------------------------------------------------
# rigid transforms
# --------------------------------------------------------------------------

def rt_to_mat4(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def transform_points(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    return pts @ jnp.swapaxes(M[..., :3, :3], -1, -2) + M[..., None, :3, 3]
