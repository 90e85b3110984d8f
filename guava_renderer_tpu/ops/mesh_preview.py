"""Mesh preview renders built on the z-buffer rasterizer.

Covers the reference BaseMeshRenderer surfaces beyond visibility
(ref: utils/graphics_utils.py:440-529): position / LBS-weight attribute
renders (`render_mesh`) and UV-textured previews (`render_textured_mesh`),
used for debugging and for visualizing the predicted uvmap_texture.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..avatar.sampling import grid_sample
from ..core.cameras import Camera
from .meshraster import MeshRasterResult, interpolate_attributes, rasterize_mesh


def render_mesh_attributes(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vertex_attrs: jnp.ndarray,
    cam: Camera,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (attr image (H, W, A), alpha (H, W, 1)); e.g. positions or
    LBS weights as attributes (ref render_mesh)."""
    res = rasterize_mesh(verts, faces, cam)
    img = interpolate_attributes(res, faces, vertex_attrs)
    alpha = (res.face_idx >= 0).astype(jnp.float32)[..., None]
    return img, alpha


def render_textured_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    faces_uv_idx: jnp.ndarray,
    texcoords: jnp.ndarray,
    texture: jnp.ndarray,
    cam: Camera,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """UV-textured preview (ref render_textured_mesh).

    texture (U, U, C) in image-space v; texcoords (T, 2) image-space.
    -> (rgb (H, W, C), alpha (H, W, 1))."""
    res: MeshRasterResult = rasterize_mesh(verts, faces, cam)
    hit = res.face_idx >= 0
    tri_uv = texcoords[faces_uv_idx[jnp.maximum(res.face_idx, 0)]]  # (H, W, 3, 2)
    uv = jnp.einsum("hwkc,hwk->hwc", tri_uv, res.bary)              # (H, W, 2)
    ndc = uv * 2.0 - 1.0
    rgb = grid_sample(texture[None], ndc[None], padding="border")[0]
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return rgb, hit.astype(jnp.float32)[..., None]
