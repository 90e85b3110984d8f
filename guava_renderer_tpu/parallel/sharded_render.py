"""Multi-chip single-frame rendering: image rows sharded over the mesh.

The reference's only parallelism is batch DP (SURVEY §2.14); this is the
TPU-native extension SURVEY §5.7 anticipates: the 512^2 frame is split into
row bands, each chip projects all Gaussians (cheap, replicated), bins and
blends only its own band's tiles, and the bands concatenate over the 'data'
axis — collectives ride ICI, Gaussian-side work is embarrassingly parallel
in pixels.

Band handling reuses the single-chip pipeline by shifting mean2d into the
band's local pixel frame; everything else (rect clipping, binning, blend)
follows from the shifted coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.cameras import Camera
from ..ops.gsplat import (
    NUM_CHANNELS,
    _CCH,
    _GEOM,
    _PK,
    RasterizeSettings,
    _tiled_to_image,
    bin_gaussians,
    blend_tiles,
)
from ..ops.gsplat_project import project_gaussians


def rasterize_row_sharded(
    means3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    mesh: Mesh,
    settings: RasterizeSettings = RasterizeSettings(),
    axis: str = "data",
):
    """Single frame over n devices -> (color (32, H, W), radii, invdepth)."""
    n = mesh.shape[axis]
    H, W = cam.height, cam.width
    assert H % (n * settings.tile) == 0, "H must split into tile-aligned bands"
    Hl = H // n

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(None, axis, None), P(), P(None, axis, None)),
        check_vma=False,
    )
    def run(m, c, o, s, q, bg_):
        d = jax.lax.axis_index(axis)
        proj = project_gaussians(m, s, q, o, cam, settings.scale_modifier,
                                 settings.antialiasing)
        # shift into this band's local pixel frame
        y_off = (d * Hl).astype(jnp.float32)
        mean2d_local = proj.mean2d - jnp.stack(
            [jnp.zeros_like(y_off), y_off]
        )
        from ..ops.gsplat import ALPHA_MIN

        contributing = proj.valid & (
            jax.lax.stop_gradient(proj.alpha) >= ALPHA_MIN
        )
        ranges, order, _, _ = bin_gaussians(
            jax.lax.stop_gradient(mean2d_local),
            jax.lax.stop_gradient(proj.depth),
            proj.radius_bin,
            contributing,
            W, Hl, settings,
            conic=jax.lax.stop_gradient(proj.conic),
            alpha=jax.lax.stop_gradient(proj.alpha),
        )
        invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
        Pn = m.shape[0]
        per_gauss = jnp.concatenate(
            [
                mean2d_local,
                proj.conic,
                proj.alpha[:, None],
                jnp.zeros((Pn, 2), jnp.float32),
                c,
                invd[:, None],
                jnp.zeros((Pn, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32),
            ],
            axis=-1,
        )
        G = settings.chunk
        pad_rows = ((order.shape[0] + G - 1) // G + 1) * G - order.shape[0]
        order = jnp.concatenate([order, jnp.zeros((pad_rows,), order.dtype)])
        bg_ext = jnp.concatenate([bg_, jnp.zeros(_CCH - NUM_CHANNELS, bg_.dtype)])
        out4, _ = blend_tiles(per_gauss, order, ranges, bg_ext, Hl, W,
                              settings.tile, G, settings.dma_banks)
        out = _tiled_to_image(out4, Hl, W, settings.tile)
        color = jnp.transpose(out[:, :, :NUM_CHANNELS], (2, 0, 1))  # (C, Hl, W)
        invdepth = out[:, :, NUM_CHANNELS][None]
        return color, proj.radius, invdepth

    color, radii, invd = run(means3d, colors, opacities, scales, quats, bg)
    return color, radii, invd
