"""Bilinear feature sampling (torch grid_sample semantics, NHWC).

align_corners=False pixel mapping, 'border' or 'zeros' padding — the two
modes the reference uses for projection sampling and inverse texture mapping
(ref: models/UbodyAvatar/ubody_gaussian.py:64-114).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(features: jnp.ndarray, coords: jnp.ndarray, padding: str = "border"):
    """features (B, H, W, C); coords (B, ..., 2) in [-1, 1] NDC (x, y).

    Returns (B, ..., C). Bilinear, align_corners=False.
    """
    B, H, W, C = features.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(B, -1, 2)
    x = ((xy[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((xy[..., 1] + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(xi, yi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = features.reshape(B, H * W, C)
        idx = yc * W + xc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if padding == "zeros":
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            vals = vals * inb[..., None]
        return vals

    v00 = gather(x0i, y0i)
    v01 = gather(x0i + 1, y0i)
    v10 = gather(x0i, y0i + 1)
    v11 = gather(x0i + 1, y0i + 1)
    out = (
        v00 * ((1 - wx) * (1 - wy))[..., None]
        + v01 * (wx * (1 - wy))[..., None]
        + v10 * ((1 - wx) * wy)[..., None]
        + v11 * (wx * wy)[..., None]
    )
    return out.reshape((B,) + lead + (C,))


def project_to_ndc(points: jnp.ndarray, w2c: jnp.ndarray, invtanfov: float):
    """World points (B, ..., 3) -> NDC (B, ..., 3) via the reference's
    pinhole model: cam_xyz * invtanfov / z (ref: ubody_gaussian.py:79-81)."""
    t = w2c[:, :3, 3].reshape((w2c.shape[0],) + (1,) * (points.ndim - 2) + (3,))
    p_cam = jnp.einsum("bij,b...j->b...i", w2c[:, :3, :3], points) + t
    return p_cam * invtanfov / (p_cam[..., 2:3] + 1e-7)
