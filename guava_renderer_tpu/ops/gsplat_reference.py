"""Naive dense Gaussian rasterizer — the correctness oracle.

Evaluates every Gaussian at every pixel in global depth order with the exact
blending rules of the reference CUDA renderCUDA<32>
(ref: cuda_rasterizer/forward.cu:276-397): alpha = min(0.99, a*exp(power)),
skip when power > 0 or alpha < 1/255, stop when transmittance would drop
below 1e-4, background blend, expected inverse depth.

O(P * H * W) — for tests and small scenes only. The production path is the
Pallas tile rasterizer in gsplat.py; both must agree to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from .gsplat_project import ProjectedGaussians, project_gaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_MIN = 1e-4


def rasterize_reference(
    means3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    tile: int = 16,
    window: tuple | None = None,
):
    """Returns (color (C, H, W), radii (P,), invdepth (1, H, W)).

    `tile` models the tile-rect coverage granularity: like the CUDA
    pipeline, a Gaussian only contributes to pixels of tiles its 3-sigma
    rect overlaps (its tail beyond the rect is cut off).

    `window=(y0, x0, h, w)` restricts the composite to a pixel window (in
    GLOBAL image coordinates — projection/culling are unchanged) and
    returns (C, h, w)/(1, h, w) images: the O(P*H*W) dense scan is the
    full-scale fidelity gate's ground truth and a full 512^2 frame is
    hours on one CPU core, while a 128^2 crop is ~1/16 of that for the
    same per-pixel semantics (tools/crosscheck_tpu.py --full-scale)."""
    from .gsplat_project import tile_rect as _tile_rect

    proj = project_gaussians(
        means3d, scales, quats, opacities, cam, scale_modifier, antialiasing
    )
    C = colors.shape[-1]
    H, W = cam.height, cam.width

    rx0, ry0, rx1, ry1 = _tile_rect(proj.mean2d, proj.radius_bin, W, H, tile)

    # global front-to-back order (depth ascending); invalid at the end
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    alpha_g = jnp.where(proj.valid, proj.alpha, 0.0)[order]
    color_g = colors[order]
    invd_g = 1.0 / proj.depth[order]
    rect_g = jnp.stack([rx0, ry0, rx1, ry1], -1)[order].astype(jnp.float32)

    if window is not None:
        wy0, wx0, wh, ww = window
        ys = wy0 + jnp.arange(wh, dtype=jnp.float32)
        xs = wx0 + jnp.arange(ww, dtype=jnp.float32)
        H, W = wh, ww
    else:
        ys = jnp.arange(H, dtype=jnp.float32)
        xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    tx = jnp.floor(px / tile)
    ty = jnp.floor(py / tile)

    def step(carry, g):
        T, acc, acc_invd = carry
        m2d, con, a_op, col, invd, rect = g
        d0 = m2d[0] - px
        d1 = m2d[1] - py
        power = -0.5 * (con[0] * d0 * d0 + con[2] * d1 * d1) - con[1] * d0 * d1
        alpha = jnp.minimum(ALPHA_MAX, a_op * jnp.exp(power))
        in_rect = (tx >= rect[0]) & (tx < rect[2]) & (ty >= rect[1]) & (ty < rect[3])
        contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rect
        # the CUDA kernel stops BEFORE applying a Gaussian that would push
        # T below 1e-4, and ignores all later ones
        would_T = T * (1.0 - alpha)
        alive = T >= 0.0  # placeholder; dead state tracked via T sign
        use = contrib & (would_T >= T_MIN) & (T > 0.0)
        # emulate per-pixel done flag: once a gaussian would drop T < 1e-4,
        # that pixel stops accepting contributions forever -> encode by
        # setting T negative (magnitude preserved for final bg blend)
        die = contrib & (would_T < T_MIN) & (T > 0.0)
        w_ = jnp.where(use, alpha * T, 0.0)
        acc = acc + w_[None] * col[:, None, None]
        acc_invd = acc_invd + w_ * invd
        T_new = jnp.where(use, would_T, T)
        T_new = jnp.where(die, -T_new, T_new)
        del alive
        return (T_new, acc, acc_invd), None

    T0 = jnp.ones((H, W), jnp.float32)
    acc0 = jnp.zeros((C, H, W), jnp.float32)
    invd0 = jnp.zeros((H, W), jnp.float32)
    (T, acc, acc_invd), _ = jax.lax.scan(
        step, (T0, acc0, invd0), (mean2d, conic, alpha_g, color_g, invd_g, rect_g)
    )
    T = jnp.abs(T)
    out = acc + T[None] * bg[:, None, None]
    return out, proj.radius, acc_invd[None]
