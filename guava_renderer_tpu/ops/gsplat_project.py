"""Gaussian preprocessing: projection, EWA splatting, culling (pure JAX).

Numerical parity with the reference CUDA preprocess
(ref: submodules/diff-gaussian-rasterization-32/cuda_rasterizer/forward.cu:74-269):
frustum cull at view z <= 0.2, quaternion (wxyz) -> covariance
Sigma = R diag(s^2) R^T, EWA Jacobian with +/-1.3*tanfov clamping, +0.3 pixel
covariance dilation (optional antialiasing opacity rescale), 3-sigma ceil
radius, `((ndc+1)*S-1)/2` pixel mapping.

All outputs are differentiable in (means3d, scales, quats, opacities) except
the integer radius/rect fields, which carry stop_gradient semantics by dtype.
This stage is plain XLA: it is dense, regular, and fuses well; Pallas is
reserved for the irregular tile stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, ndc2pix

_HI = jax.lax.Precision.HIGHEST
NEAR_CULL_Z = 0.2  # ref: auxiliary.h in_frustum
COV_DILATION = 0.3  # ref: forward.cu:216 (h_var)


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray      # (P, 2) pixel coords
    conic: jnp.ndarray       # (P, 3) inverse 2D covariance (a, b, c)
    alpha: jnp.ndarray       # (P,) opacity (x antialiasing scale if enabled)
    depth: jnp.ndarray       # (P,) camera-space z
    radius: jnp.ndarray      # (P,) int32 3-sigma pixel radius (0 = culled);
    #                          reference-parity semantics (forward.cu:237-240)
    radius_bin: jnp.ndarray  # (P,) int32 opacity-tightened radius used for
    #                          tile binning only — renders bit-identically
    #                          with far fewer instances (see project_gaussians)
    valid: jnp.ndarray       # (P,) bool


def quat_scale_to_cov3d_rows(quats: jnp.ndarray, scales: jnp.ndarray):
    """(P, 4) wxyz (NOT renormalized, matching ref forward.cu:124) and
    (P, 3) -> the 9 entries of M = R diag(s) as (P,) component arrays.

    Fully scalarized: batched (P,3,3) matmuls lower to terrible tiny-MXU
    code on TPU; component-wise VPU math is ~100x faster at this shape.
    """
    r, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    m00 = (1 - 2 * (y * y + z * z)) * sx
    m01 = (2 * (x * y - r * z)) * sy
    m02 = (2 * (x * z + r * y)) * sz
    m10 = (2 * (x * y + r * z)) * sx
    m11 = (1 - 2 * (x * x + z * z)) * sy
    m12 = (2 * (y * z - r * x)) * sz
    m20 = (2 * (x * z - r * y)) * sx
    m21 = (2 * (y * z + r * x)) * sy
    m22 = (1 - 2 * (x * x + y * y)) * sz
    return (m00, m01, m02, m10, m11, m12, m20, m21, m22)


def quat_scale_to_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(P, 3, 3) world covariance R diag(s^2) R^T (reference/tests helper)."""
    m = quat_scale_to_cov3d_rows(quats, scales)
    M = jnp.stack(
        [jnp.stack(m[0:3], -1), jnp.stack(m[3:6], -1), jnp.stack(m[6:9], -1)], axis=-2
    )
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=_HI)


def mark_visible(means3d: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Standalone frustum pre-cull: (P, 3) -> (P,) bool.

    API parity with GaussianRasterizer_32.markVisible (ref:
    diff_gaussian_rasterization_32/__init__.py:158-172), whose CUDA
    in_frustum test reduces to camera-space z > 0.2 — the NDC bounds check
    is commented out upstream (ref: auxiliary.h:166)."""
    p_view = means3d @ cam.R.T + cam.t
    return p_view[:, 2] > NEAR_CULL_Z


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
) -> ProjectedGaussians:
    P = means3d.shape[0]
    opacities = opacities.reshape(P)

    # camera space + near cull. Geometry matmuls pin HIGHEST precision: the
    # TPU default computes f32 matmuls with bf16 passes, and position error
    # amplifies through conic/alpha into ~1e-2 color diffs (measured in the
    # r3 on-chip golden diff, outputs/bench/tpu_diag_r3a).
    p_view = jnp.matmul(means3d, cam.R.T, precision=_HI) + cam.t
    tz = p_view[:, 2]
    in_front = tz > NEAR_CULL_Z

    # NDC -> pixel center
    full = cam.full_proj_matrix()
    hom = jnp.matmul(means3d, full[:3, :3].T, precision=_HI) + full[:3, 3]
    w = jnp.matmul(means3d, full[3, :3], precision=_HI) + full[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    mean2d = jnp.stack(
        [
            ndc2pix(hom[:, 0] * inv_w, cam.width),
            ndc2pix(hom[:, 1] * inv_w, cam.height),
        ],
        axis=-1,
    )

    # world covariance factor M = R diag(s), as scalar components
    m = quat_scale_to_cov3d_rows(quats, scales * scale_modifier)

    # EWA: clamp the tangent before building the Jacobian (ref: forward.cu:81-87)
    lim_x = 1.3 * cam.tanfovx
    lim_y = 1.3 * cam.tanfovy
    txz = jnp.clip(p_view[:, 0] / tz, -lim_x, lim_x) * tz
    tyz = jnp.clip(p_view[:, 1] / tz, -lim_y, lim_y) * tz
    fx, fy = cam.focal_x, cam.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # JW rows (2x3), fully scalarized: J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00, j02 = fx * inv_z, -fx * txz * inv_z2
    j11, j12 = fy * inv_z, -fy * tyz * inv_z2
    R = cam.R  # (3, 3) static
    u0 = j00 * R[0, 0] + j02 * R[2, 0]
    u1 = j00 * R[0, 1] + j02 * R[2, 1]
    u2 = j00 * R[0, 2] + j02 * R[2, 2]
    v0 = j11 * R[1, 0] + j12 * R[2, 0]
    v1 = j11 * R[1, 1] + j12 * R[2, 1]
    v2 = j11 * R[1, 2] + j12 * R[2, 2]
    # rows of (JW) @ M^T ... we need cov2d = (JW) Sigma (JW)^T with
    # Sigma = M M^T  =>  cov2d = (JW M)(JW M)^T ; p = u.M rows, q = v.M rows
    m00, m01, m02, m10, m11_, m12_, m20, m21, m22 = m
    p0 = u0 * m00 + u1 * m10 + u2 * m20
    p1 = u0 * m01 + u1 * m11_ + u2 * m21
    p2 = u0 * m02 + u1 * m12_ + u2 * m22
    q0 = v0 * m00 + v1 * m10 + v2 * m20
    q1 = v0 * m01 + v1 * m11_ + v2 * m21
    q2 = v0 * m02 + v1 * m12_ + v2 * m22
    a = p0 * p0 + p1 * p1 + p2 * p2
    b = p0 * q0 + p1 * q1 + p2 * q2
    c = q0 * q0 + q1 * q1 + q2 * q2
    det_raw = a * c - b * b
    a = a + COV_DILATION
    c = c + COV_DILATION
    det = a * c - b * b

    alpha_scale = 1.0
    if antialiasing:
        alpha_scale = jnp.sqrt(jnp.maximum(2.5e-5, det_raw / det))

    nonzero = det != 0.0
    det_safe = jnp.where(nonzero, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    # Public radius: 3-sigma from the max eigenvalue, the reference's exact
    # semantics (ref: forward.cu:237-240). Binning extents: tightened
    # per-splat by opacity AND per-axis by the covariance diagonal. A pixel
    # only contributes when a0*exp(-power) >= 1/255 (the blend's skip,
    # forward.cu:358-360), i.e. inside the ellipse q <= 2*ln(255*a0), whose
    # axis-aligned bounding box is +-sqrt(q_cut * cov_diag) — far tighter
    # than the isotropic sigma_max circle for anisotropic splats. Clamped to
    # the reference's 3-sigma circle box (the CUDA rect cuts there too, so
    # pixels outside never contribute in either implementation). Renders
    # bit-identically with fewer duplicated instances AND less cap
    # truncation (the capped row-major slots land on contributing tiles
    # instead of empty corners). Consumers using radii for densification
    # thresholds or CUDA-parity checks get the 3-sigma value (ADVICE r2).
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sig = jnp.sqrt(jnp.maximum(lam, 0.0))
    a0 = opacities * alpha_scale
    # floor at 0.3 sigma: splats with a0 barely above 1/255 contribute only
    # at their center pixel, which a zero radius would wrongly cull. NO
    # upper clip here: high-opacity splats keep alpha >= 1/255 beyond
    # 3*sqrt(cov_diag) (CUDA has no per-pixel 3-sigma test — only its rect
    # cuts, at 3*sigma_max), so the ellipse arm uses the exact q_cut and
    # only the circle arm enforces the reference's 3-sigma rect bound.
    nsig = jnp.maximum(
        jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * a0, 1.0))), 0.3
    )
    radius_f = jnp.ceil(3.0 * sig)
    # +1 pixel: tile_rect's max-exclusive bound floor((m + r + T-1)/T)
    # truncates the last tile when frac(m + r) < 1 (the CUDA getRect
    # truncation, auxiliary.h:45-56); one pixel of slack makes the cover
    # exact — floor((z + 1 + T-1)/T) = floor(z/T) + 1 for any float z.
    # Clamped at the 3-sigma radius, where coverage reverts to the
    # reference's own (truncating) rect semantics.
    rx_f = jnp.minimum(
        jnp.ceil(nsig * jnp.sqrt(jnp.maximum(a, 0.0))) + 1.0, radius_f)
    ry_f = jnp.minimum(
        jnp.ceil(nsig * jnp.sqrt(jnp.maximum(c, 0.0))) + 1.0, radius_f)

    valid = in_front & nonzero & (radius_f > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    radius_bin = jnp.where(
        valid[:, None],
        jnp.stack([rx_f, ry_f], axis=-1),
        0.0,
    ).astype(jnp.int32)

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        alpha=opacities * alpha_scale,
        depth=tz,
        radius=radius,
        radius_bin=radius_bin,
        valid=valid,
    )


def tile_rect(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
    tile: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tile-grid bounding rect per Gaussian (ref: auxiliary.h getRect).

    `radius` is (P,) isotropic or (P, 2) per-axis (rx, ry) extents in
    pixels (the opacity-tightened ellipse bounding box, see
    project_gaussians). Returns (x0, y0, x1, y1) int32; max-exclusive,
    clamped to the grid.
    """
    gx = (width + tile - 1) // tile
    gy = (height + tile - 1) // tile
    r = radius.astype(jnp.float32)
    rx, ry = (r[:, 0], r[:, 1]) if r.ndim == 2 else (r, r)
    x0 = jnp.clip(((mean2d[:, 0] - rx) / tile).astype(jnp.int32), 0, gx)
    y0 = jnp.clip(((mean2d[:, 1] - ry) / tile).astype(jnp.int32), 0, gy)
    x1 = jnp.clip(((mean2d[:, 0] + rx + tile - 1) / tile).astype(jnp.int32), 0, gx)
    y1 = jnp.clip(((mean2d[:, 1] + ry + tile - 1) / tile).astype(jnp.int32), 0, gy)
    return x0, y0, x1, y1
