"""Mesh geometry helpers (pure jnp).

`face_orientation` reproduces the reference's per-face TBN frame + scale used
to bind UV Gaussians to the deforming surface
(ref: utils/graphics_utils.py:61-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _safe_normalize(x: jnp.ndarray) -> jnp.ndarray:
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, _EPS))


def face_orientation(
    verts: jnp.ndarray, faces: jnp.ndarray, return_scale: bool = True
):
    """Per-face orthonormal frame and isotropic scale.

    verts: (..., V, 3); faces: (F, 3) int.
    Returns R (..., F, 3, 3) with columns [tangent, normal, bitangent']
    and scale (..., F, 1).
    """
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]

    a0 = _safe_normalize(v1 - v0)                        # tangent
    a1 = _safe_normalize(jnp.cross(a0, v2 - v0))         # normal
    a2 = -_safe_normalize(jnp.cross(a1, a0))             # bitangent (negated)
    R = jnp.stack([a0, a1, a2], axis=-1)                 # columns

    if not return_scale:
        return R, None
    s0 = jnp.linalg.norm(v1 - v0, axis=-1, keepdims=True)
    s1 = jnp.abs(jnp.sum(a2 * (v2 - v0), axis=-1, keepdims=True))
    scale = (s0 + s1) / 2.0
    return R, scale


def face_centers_bary(
    verts: jnp.ndarray, faces: jnp.ndarray, face_idx: jnp.ndarray, bary: jnp.ndarray
) -> jnp.ndarray:
    """Surface points from (face id, barycentric) bindings.

    verts (..., V, 3), faces (F, 3), face_idx (N,), bary (N, 3)
    -> (..., N, 3).
    """
    tri = faces[face_idx]                       # (N, 3)
    pts = verts[..., tri, :]                    # (..., N, 3, 3)
    return jnp.einsum("...nkc,nk->...nc", pts, bary)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals. verts (V, 3) or (B, V, 3)."""
    batched = verts.ndim == 3
    if not batched:
        verts = verts[None]
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    out = jnp.zeros_like(verts)
    for k in range(3):
        out = out.at[:, faces[:, k]].add(fn)
    out = _safe_normalize(out)
    return out if batched else out[0]
