"""Gaussian renderer + neural refiner.

Parity with `GaussianRenderer.forward_nueral_refine`
(ref: models/UbodyAvatar/gaussian_render.py:19-84): rasterize the deformed
Gaussian set per batch item (32 channels, colors precomputed, sh_degree 0,
antialiasing off), split raw RGB = first 3 channels, refine all 32 channels
to RGB with the registered neural refiner (StyleUNet-small by default).
"""

from __future__ import annotations

from typing import Any, NamedTuple

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

        feats, radiis, invds = [], [], []
        for b in range(B):
            # NHWC straight out of the rasterizer: the refiner and losses
            # are NHWC, so the (C,H,W) API layout would cost two full-image
            # relayouts per frame
            color, radii, invd = rasterize(
                gaussians.xyz[b],
                gaussians.colors[b],
                gaussians.opacity[b],
                gaussians.scaling[b],
                gaussians.rotation[b],
                cams[b] if isinstance(cams, (list, tuple)) else cams,
                bg,
                self.settings,
                channels_first=False,
            )
            feats.append(color)  # (H, W, 32)
            radiis.append(radii)
            invds.append(invd[:, :, 0])
        feature_renders = jnp.stack(feats)
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
            radii=jnp.stack(radiis),
            invdepth=jnp.stack(invds),
        )
