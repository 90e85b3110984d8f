"""DINO + DPT-style fusion encoder.

Architecture parity with the reference's DINO_Enocder
(ref: models/modules/net_module/dino_encoder.py:7-113): 5 intermediate ViT
layers; the deepest 4 feed a DPT pyramid (1x1 projections to
[256,512,1024,1024], resize 4x/2x/1x/0.5x, RGB concat, 3x3 reduce to 256,
4 FeatureFusionBlocks), the shallowest is a separately-projected low-level
path; outputs f_map1 (UV branch features), f_map2 (projection-sampling
features) and a global token.

Note: the reference takes `image_features[-1][:, 0]` as the global feature
(ref: dino_encoder.py:111) — with DINOv2's get_intermediate_layers that is
the *first patch token*, not CLS. Our ViT returns tokens with CLS at index
0, so `tokens[:, 1]` here reproduces the reference's exact behavior and
`tokens[:, 0]` would be the true CLS; we follow the reference.

All tensors NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, leaky_relu, resize_bilinear
from .vit import VisionTransformer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv(self.features, (3, 3), padding=1)(out)
        out = nn.relu(out)
        out = Conv(self.features, (3, 3), padding=1)(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """(ref: dino_encoder.py:173-228)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, size=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, name="res1")(skip)
        out = ResidualConvUnit(self.features, name="res2")(out)
        if size is None:
            size = (out.shape[1] * 2, out.shape[2] * 2)
        out = resize_bilinear(out, size, antialias=False)
        return Conv(self.features, (1, 1))(out)


class DinoDPTEncoder(nn.Module):
    out_dim_1: int = 32      # f_map1 channels (cfg MODEL.dino_out_dim)
    out_dim_2: int = 128     # f_map2 channels (cfg MODEL.prj_out_dim)
    hidden: int = 256
    output_size: int = 512
    freeze_backbone: bool = True
    # Backbone sizing (ViT-B/14 defaults = DINOv2 weight-compatible). The
    # micro settings exist so dry-run/CI configs can cross the same module
    # boundary at a fraction of the compile/execute cost.
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    vit_pos_grid: int = 37
    pyramid_dims: tuple = (256, 512, 1024, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """images: (B, H, W, 3) in [0, 1] (H=W=518 for the GUAVA config).

        Returns {'f_map1': (B, S, S, out1), 'f_map2': (B, S, S, out2),
                 'f_global': (B, 768)} with S = output_size."""
        B, H, W, _ = images.shape
        gh, gw = H // 14, W // 14
        mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(IMAGENET_STD, images.dtype)
        x = (images - mean) / std

        vit = VisionTransformer(
            num_intermediate=5,
            dim=self.vit_dim,
            depth=self.vit_depth,
            num_heads=self.vit_heads,
            pos_grid=self.vit_pos_grid,
            dtype=self.dtype,
            name="dino",
        )
        tokens = vit(x)
        if self.freeze_backbone:
            tokens = [jax.lax.stop_gradient(t) for t in tokens]
        low_level, *levels = tokens  # low = 8th block; levels = last 4

        # reference global feature: first *patch* token of the last level
        f_global = levels[-1][:, 1]

        out_dims = self.pyramid_dims
        feats = []
        for i, (tok, od) in enumerate(zip(levels, out_dims)):
            f = tok[:, 1:].reshape(B, gh, gw, -1)
            f = Conv(od, (1, 1), name=f"project{i}")(f)
            if i == 0:
                f = nn.ConvTranspose(od, (4, 4), strides=(4, 4), name="resize0")(f)
            elif i == 1:
                f = nn.ConvTranspose(od, (2, 2), strides=(2, 2), name="resize1")(f)
            elif i == 3:
                f = Conv(od, (3, 3), strides=(2, 2), padding=1, name="resize3")(f)
            rgb = resize_bilinear(x, (f.shape[1], f.shape[2]))
            f = jnp.concatenate([jax.lax.stop_gradient(rgb), f], axis=-1)
            f = Conv(self.hidden, (3, 3), padding=1, use_bias=False, name=f"layer_rn{i}")(f)
            feats.append(f)

        path = FeatureFusionBlock(self.hidden, name="refine0")(
            feats[3], size=(feats[2].shape[1], feats[2].shape[2])
        )
        path = FeatureFusionBlock(self.hidden, name="refine1")(
            path, feats[2], size=(feats[1].shape[1], feats[1].shape[2])
        )
        path = FeatureFusionBlock(self.hidden, name="refine2")(
            path, feats[1], size=(feats[0].shape[1], feats[0].shape[2])
        )
        path = FeatureFusionBlock(self.hidden, name="refine3")(path, feats[0])

        S = self.output_size
        # F.interpolate sites in the reference: no antialiasing
        path = resize_bilinear(path, (S, S), antialias=False)
        image_l = resize_bilinear(x, (S, S), antialias=False)

        low = low_level[:, 1:].reshape(B, gh, gw, -1)
        low = resize_bilinear(low, (gh * 2, gw * 2), align_corners=True)
        low = Conv(self.hidden, (3, 3), padding=1, use_bias=False, name="project_l0")(low)
        low = resize_bilinear(low, (low.shape[1] * 4, low.shape[2] * 4), align_corners=True)
        low = Conv(self.hidden // 2, (3, 3), padding=1, use_bias=False, name="project_l1")(low)
        low = resize_bilinear(low, (S, S), antialias=False)

        path = jnp.concatenate([path, image_l], axis=-1)
        fused = Conv(self.hidden, (3, 3), padding=1, use_bias=False, name="fuse_l0")(
            jnp.concatenate([path, low], axis=-1)
        )
        fused = leaky_relu(fused, 0.01)  # torch LeakyReLU default slope
        fused = Conv(self.hidden, (3, 3), padding=1, use_bias=False, name="fuse_l1")(fused)
        skip = Conv(self.hidden, (3, 3), padding=1, use_bias=False, name="skip_l")(path)
        path = fused + skip

        f_map1 = Conv(self.out_dim_1, (3, 3), padding=1, name="output_conv")(path)
        f_map2 = Conv(self.out_dim_2, (3, 3), padding=1, name="output_conv_2")(path)
        return {"f_map1": f_map1, "f_map2": f_map2, "f_global": f_global}
