"""Gaussian renderer + neural refiner.

Parity with `GaussianRenderer.forward_nueral_refine`
(ref: models/UbodyAvatar/gaussian_render.py:19-84): rasterize the deformed
Gaussian set per batch item (32 channels, colors precomputed, sh_degree 0,
antialiasing off), split raw RGB = first 3 channels, refine all 32 channels
to RGB with the registered neural refiner (StyleUNet-small by default).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.cameras import Camera
from ..models.layers import resize_bilinear
from ..models.styleunet import SimpleUNet, StyleUNet
from ..ops.gsplat import RasterizeSettings, rasterize
from .state import GaussianSet


class RenderOutputs(NamedTuple):
    renders: jnp.ndarray        # (B, H, W, 3) refined RGB
    raw_renders: jnp.ndarray    # (B, H, W, 3) rasterized RGB (channels 0:3)
    feature_renders: jnp.ndarray  # (B, H, W, 32) full rasterized features
    extra_renders: jnp.ndarray  # (B, H, W, 3) channels 3:6 (ref :83)
    radii: jnp.ndarray          # (B, P)
    invdepth: jnp.ndarray       # (B, H, W)


class NeuralRefiner(nn.Module):
    """Registry shim over the refiner families (ref: net_module/__init__.py:3-6)."""

    refiner_type: str = "styleunet"
    image_size: int = 512
    in_dim: int = 32
    out_dim: int = 3
    style_dim: int = 512
    num_mlp: int = 8
    channel_scale: float = 1.0
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        if self.refiner_type == "styleunet":
            return StyleUNet(
                in_size=self.image_size,
                out_size=self.image_size,
                in_dim=self.in_dim,
                out_dim=self.out_dim,
                style_dim=self.style_dim,
                num_mlp=self.num_mlp,
                channel_scale=self.channel_scale,
                small=self.small,
                name="refiner",
            )(x, rng=rng)
        if self.refiner_type == "simpleunet":
            return nn.sigmoid(
                SimpleUNet(
                    in_size=self.image_size,
                    out_size=self.image_size,
                    in_dim=self.in_dim,
                    out_dim=self.out_dim,
                    channel_scale=self.channel_scale,
                    name="refiner",
                )(x)
            )
        raise ValueError(f"unknown refiner_type {self.refiner_type!r}")


class GaussianRenderer(nn.Module):
    """refiner_size: the resolution the refiner was trained at (styleunet
    out_size). When image_size differs (multi-res render_motion at
    720/1080/2048), we rasterize at image_size, refine at refiner_size, and
    bilinearly upscale the RGB back — the reference's StyleUNet cannot run
    on non-512 inputs at all (final_linear expects a 4x4 bottleneck,
    ref styleunet.py:134,186), so this is the working TPU equivalent of its
    multi-resolution flag."""

    refiner_type: str = "styleunet"
    image_size: int = 512
    channel_scale: float = 1.0
    small: bool = True
    style_dim: int = 512
    num_mlp: int = 8
    settings: RasterizeSettings = RasterizeSettings()
    refiner_size: int | None = None
    # serving lever: run the refiner in bfloat16 (cast in, cast out; caller
    # casts the neural_refiner param subtree). Rasterization stays f32.
    refiner_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        gaussians: GaussianSet,
        cams: list[Camera],
        bg: jnp.ndarray | None = None,
    ) -> RenderOutputs:
        B = gaussians.xyz.shape[0]
        if bg is None:
            bg = jnp.zeros(32, jnp.float32)

        if isinstance(cams, (list, tuple)):
            cam0 = cams[0]
            Rs = jnp.stack([c.R for c in cams])
            ts = jnp.stack([c.t for c in cams])
            fxs = jnp.stack([jnp.asarray(c.tanfovx, jnp.float32) for c in cams])
            fys = jnp.stack([jnp.asarray(c.tanfovy, jnp.float32) for c in cams])
        else:
            cam0 = cams
            Rs = jnp.broadcast_to(cams.R, (B, 3, 3))
            ts = jnp.broadcast_to(cams.t, (B, 3))
            fxs = jnp.broadcast_to(jnp.asarray(cams.tanfovx, jnp.float32), (B,))
            fys = jnp.broadcast_to(jnp.asarray(cams.tanfovy, jnp.float32), (B,))

        def _render_one(xs):
            xyz, col, opa, sca, rot, R, t, fx, fy = xs
            cam = Camera(R=R, t=t, tanfovx=fx, tanfovy=fy,
                         width=cam0.width, height=cam0.height,
                         znear=cam0.znear, zfar=cam0.zfar)
            # NHWC straight out of the rasterizer: the refiner and losses
            # are NHWC, so the (C,H,W) API layout would cost two full-image
            # relayouts per frame
            color, radii, invd = rasterize(
                xyz, col, opa, sca, rot, cam, bg, self.settings,
                channels_first=False,
            )
            return color, radii, invd[:, :, 0]

        xs = (gaussians.xyz, gaussians.colors, gaussians.opacity,
              gaussians.scaling, gaussians.rotation, Rs, ts, fxs, fys)
        if B == 1:
            # no scan wrapper for the single-image hot path (inference)
            color, radii, invd = _render_one(
                jax.tree_util.tree_map(lambda a: a[0], xs))
            feats = (color[None], radii[None], invd[None])
        else:
            # lax.map (scan), NOT a Python loop: an unrolled batch clones
            # the whole raster fwd+bwd graph per item — at batch 3 the 512^2
            # train step's MLIR hits ~52 MB and the remote TPU compiler
            # rejects it — and a scan also serializes the raster temporaries
            # (one item's ~3 GiB at a time instead of B at once).
            feats = jax.lax.map(_render_one, xs)
        feature_renders, radiis, invds = feats
        rng = self.make_rng("noise") if self.has_rng("noise") else None
        rsize = self.refiner_size or self.image_size
        refiner_in = feature_renders
        if rsize != self.image_size:
            refiner_in = resize_bilinear(refiner_in, (rsize, rsize))
        if self.refiner_dtype is not None:
            refiner_in = refiner_in.astype(self.refiner_dtype)
        renders = NeuralRefiner(
            refiner_type=self.refiner_type,
            image_size=rsize,
            channel_scale=self.channel_scale,
            small=self.small,
            style_dim=self.style_dim,
            num_mlp=self.num_mlp,
            name="neural_refiner",
        )(refiner_in, rng=rng)
        renders = renders.astype(jnp.float32)
        if rsize != self.image_size:
            renders = resize_bilinear(renders, (self.image_size, self.image_size))
        return RenderOutputs(
            renders=renders,
            raw_renders=feature_renders[..., :3],
            feature_renders=feature_renders,
            extra_renders=feature_renders[..., 3:6],
            radii=radiis,
            invdepth=invds,
        )
