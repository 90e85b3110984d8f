"""Camera model and Gaussian-splatting projection conventions.

Matches the reference's GS camera stack semantics
(ref: utils/graphics_utils.py:15-50): COLMAP-style world-to-camera,
GL-style perspective with z_near=0.01 / z_far=100, and the rasterizer's
ndc->pixel mapping `((ndc + 1) * S - 1) / 2`
(ref: submodules/diff-gaussian-rasterization-32/cuda_rasterizer/auxiliary.h:40-43).

Internally we keep matrices in natural math convention (apply as M @ p);
`gs_layout()` exports the transposed row-vector layout the reference's
Python API uses, for checkpoint/data interop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class Camera(NamedTuple):
    """Pinhole camera. Static ints for width/height; arrays for the rest."""

    R: jnp.ndarray        # (3, 3) world-to-camera rotation
    t: jnp.ndarray        # (3,) world-to-camera translation
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tanfovy)

    @property
    def campos(self) -> jnp.ndarray:
        """Camera center in world space: -R^T t."""
        return -self.R.T @ self.t

    def view_matrix(self) -> jnp.ndarray:
        """(4, 4) world->camera, apply as V @ [p; 1]."""
        V = jnp.zeros((4, 4), jnp.float32)
        V = V.at[:3, :3].set(self.R)
        V = V.at[:3, 3].set(self.t)
        return V.at[3, 3].set(1.0)

    def proj_matrix(self) -> jnp.ndarray:
        """(4, 4) GS-convention perspective (ref: graphics_utils.py:22-41)."""
        zn, zf = self.znear, self.zfar
        P = jnp.zeros((4, 4), jnp.float32)
        P = P.at[0, 0].set(1.0 / self.tanfovx)
        P = P.at[1, 1].set(1.0 / self.tanfovy)
        P = P.at[2, 2].set(zf / (zf - zn))
        P = P.at[2, 3].set(-(zf * zn) / (zf - zn))
        return P.at[3, 2].set(1.0)

    def full_proj_matrix(self) -> jnp.ndarray:
        return jnp.matmul(self.proj_matrix(), self.view_matrix(), precision=_HI)

    def gs_layout(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(view^T, (proj@view)^T) as stored by the reference's data layer."""
        return self.view_matrix().T, self.full_proj_matrix().T

    @staticmethod
    def from_gs_layout(
        world_view_transform: jnp.ndarray,
        tanfovx,
        tanfovy,
        width: int,
        height: int,
    ) -> "Camera":
        V = world_view_transform.T
        return Camera(
            R=V[:3, :3],
            t=V[:3, 3],
            tanfovx=jnp.asarray(tanfovx, jnp.float32),
            tanfovy=jnp.asarray(tanfovy, jnp.float32),
            width=width,
            height=height,
        )


def world_to_cam(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world -> camera space."""
    return pts @ cam.R.T + cam.t


def project_points(cam: Camera, pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> (pixel xy (..., 2), camera-space depth (...,)).

    Uses the rasterizer's exact ndc->pixel convention.
    """
    p_view = world_to_cam(cam, pts)
    z = p_view[..., 2]
    full = cam.full_proj_matrix()
    hom = pts @ full[:3, :3].T + full[:3, 3]
    w = pts @ full[3, :3] + full[3, 3]
    ndc = hom[..., :2] / (w[..., None] + 1e-7)
    px = ndc2pix(ndc[..., 0], cam.width)
    py = ndc2pix(ndc[..., 1], cam.height)
    return jnp.stack([px, py], axis=-1), z


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def look_at_camera(
    eye,
    target,
    up=(0.0, 1.0, 0.0),
    tanfov: float = 0.34,
    width: int = 512,
    height: int = 512,
) -> Camera:
    """Build a world-to-camera looking from eye to target (z forward)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd])  # rows: camera axes in world
    t = -R @ eye
    return Camera(
        R=R,
        t=t,
        tanfovx=jnp.asarray(tanfov, jnp.float32),
        tanfovy=jnp.asarray(tanfov, jnp.float32),
        width=width,
        height=height,
    )
