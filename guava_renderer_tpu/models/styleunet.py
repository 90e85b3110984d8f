"""StyleUNet / SimpleUNet — UNet encoder + StyleGAN2-CSFT generator.

Architecture parity with the reference
(ref: models/modules/net_module/styleunet/styleunet.py:9-407): a bilinear
ResBlock UNet produces a 512-d style code (4x4 bottleneck -> linear) and
per-scale SFT scale/shift conditions; a StyleGAN2 generator with weight
(de)modulation consumes them. The `small` variant uses one style conv + one
plain conv per scale. Everything is plain convs + bilinear resizes — pure
XLA, no custom CUDA (the reference also avoids upfirdn2d, styleunet.py:518).

The reference's grouped-conv ModulatedConv2d trick (fold batch into groups)
is replaced with the TPU-friendly equivalent: modulate the *inputs*, run one
shared conv, then demodulate the *outputs* — identical math for demodulated
convs with per-sample styles, and it keeps a single large MXU conv.

Noise injection follows the reference: fresh Gaussian noise per call even at
eval (styleunet.py:281-284) unless `deterministic` rng is withheld.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, ResBlock, leaky_relu, resize_bilinear, upsample2x

_CHANNELS = {4: 256, 8: 256, 16: 256, 32: 256, 64: 128, 128: 64, 256: 32, 512: 16, 1024: 8}


def _chan(size: int, scale: float) -> int:
    return int(_CHANNELS[size] / scale)


class ModulatedConv(nn.Module):
    """StyleGAN2 modulated conv (input-scale / output-demodulate form)."""

    out_channels: int
    kernel: int
    style_dim: int
    demodulate: bool = True
    sample_mode: str | None = None  # None | 'upsample' | 'downsample'

    @nn.compact
    def __call__(self, x, style):
        B, H, W, C = x.shape
        k = self.kernel
        # style -> per-input-channel scale (bias init 1, ref styleunet.py:530)
        s = nn.Dense(C, bias_init=nn.initializers.ones, name="modulation")(style)  # (B, C)
        weight = self.param(
            "weight",
            nn.initializers.normal(1.0 / math.sqrt(C * k * k)),
            (k, k, C, self.out_channels),
        )
        if self.sample_mode == "upsample":
            x = upsample2x(x)
        elif self.sample_mode == "downsample":
            x = resize_bilinear(x, (H // 2, W // 2))
        xm = x * s[:, None, None, :]
        # im2col + one matmul: ~5x over XLA's native conv at these channel
        # widths (tpu_diag_r8 refiner3; same trick as layers.Conv)
        if k == 1:
            out = xm @ weight[0, 0]
        else:
            Hc, Wc = xm.shape[1], xm.shape[2]
            p = k // 2
            xp = jnp.pad(xm, ((0, 0), (p, p), (p, p), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, dy:dy + Hc, dx:dx + Wc]
                 for dy in range(k) for dx in range(k)], axis=-1,
            )
            out = cols @ weight.reshape(k * k * C, self.out_channels)
        if self.demodulate:
            # demod per (batch, out_channel): rsqrt(sum_k,c (w * s)^2)
            w2 = jnp.einsum("hwco,bc->bo", weight**2, s**2)
            out = out * jax.lax.rsqrt(w2 + 1e-8)[:, None, None, :]
        return out


class StyleConv(nn.Module):
    out_channels: int
    style_dim: int
    sample_mode: str | None = None

    @nn.compact
    def __call__(self, x, style, noise_rng=None):
        out = ModulatedConv(
            self.out_channels, 3, self.style_dim, True, self.sample_mode, name="mod"
        )(x, style) * (2**0.5)
        nw = self.param("noise_weight", nn.initializers.zeros, ())
        if noise_rng is not None:
            noise = jax.random.normal(noise_rng, out.shape[:3] + (1,), out.dtype)
            out = out + nw * noise
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return leaky_relu(out + bias)


class ToRGB(nn.Module):
    out_dim: int
    style_dim: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(self.out_dim, 1, self.style_dim, False, None, name="mod")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        out = out + bias
        if skip is not None:
            if self.upsample:
                skip = upsample2x(skip)
            out = out + skip
        return out


class StyleMLP(nn.Module):
    style_dim: int
    num_mlp: int

    @nn.compact
    def __call__(self, x):
        x = x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)
        for i in range(self.num_mlp):
            x = nn.Dense(self.style_dim, name=f"mlp{i}")(x)
            x = leaky_relu(x)
        return x


class StyleGAN2GeneratorCSFT(nn.Module):
    """(ref: styleunet.py:211-310); `small` variant (:312-407)."""

    out_size: int
    out_dim: int = 3
    style_dim: int = 512
    num_mlp: int = 8
    channel_scale: float = 1.0
    small: bool = False

    @nn.compact
    def __call__(self, style, conditions, rng=None):
        log_size = int(math.log2(self.out_size))
        style = StyleMLP(self.style_dim, self.num_mlp, name="style_mlp")(style)
        B = style.shape[0]

        def noise_key(i):
            return None if rng is None else jax.random.fold_in(rng, i)

        const = self.param(
            "constant_input", nn.initializers.normal(1.0), (1, 4, 4, _chan(4, self.channel_scale))
        )
        out = jnp.broadcast_to(const, (B,) + const.shape[1:])
        out = StyleConv(_chan(4, self.channel_scale), self.style_dim, name="conv1")(
            out, style, noise_key(0)
        )
        skip = ToRGB(self.out_dim, self.style_dim, upsample=False, name="to_rgb1")(out, style)

        ni = 1
        for li, res in enumerate(range(3, log_size + 1)):
            ch = _chan(2**res, self.channel_scale)
            out = StyleConv(
                ch, self.style_dim, sample_mode="upsample", name=f"conv_up{li}"
            )(out, style, noise_key(ni))
            ni += 1
            # SFT: conditions[2*li] = scale, [2*li+1] = shift
            if 2 * li + 1 < len(conditions):
                out = out * conditions[2 * li] + conditions[2 * li + 1]
            if self.small:
                out = leaky_relu(Conv(ch, (3, 3), padding=1, name=f"conv_plain{li}")(out))
            else:
                out = StyleConv(ch, self.style_dim, name=f"conv_same{li}")(
                    out, style, noise_key(ni)
                )
                ni += 1
            skip = ToRGB(self.out_dim, self.style_dim, name=f"to_rgb_up{li}")(out, style, skip)
        return skip


class StyleUNet(nn.Module):
    """(ref: styleunet.py:86-207). Input/output NHWC."""

    in_size: int
    out_size: int
    in_dim: int
    out_dim: int
    style_dim: int = 512
    num_mlp: int = 8
    activation: bool = True
    channel_scale: float = 1.0
    small: bool = False
    extra_style_dim: int = -1

    @nn.compact
    def __call__(self, x, extra_style=None, rng=None):
        cs = self.channel_scale
        log_size = int(math.log2(self.out_size))
        if x.shape[1] < self.out_size:
            x = resize_bilinear(x, (self.out_size, self.out_size))

        if self.in_size <= self.out_size:
            feat = leaky_relu(Conv(_chan(self.out_size, cs), (1, 1), name="first")(x))
        else:
            feat = leaky_relu(Conv(_chan(self.in_size, cs), (1, 1), name="first")(x))
            feat = ResBlock(_chan(self.out_size, cs), "down", name="first_down")(feat)

        skips = []
        for li, res in enumerate(range(log_size, 2, -1)):
            feat = ResBlock(_chan(2 ** (res - 1), cs), "down", name=f"down{li}")(feat)
            skips.insert(0, feat)
        feat = leaky_relu(Conv(_chan(4, cs), (3, 3), padding=1, name="final_conv")(feat))

        style = nn.Dense(self.style_dim, name="final_linear")(feat.reshape(feat.shape[0], -1))
        if self.extra_style_dim > 0 and extra_style is not None:
            h = jnp.concatenate([style, extra_style], axis=-1)
            h = leaky_relu(nn.Dense(self.style_dim, name="style_fuse0")(h))
            style = nn.Dense(self.style_dim, name="style_fuse1")(h)

        conditions = []
        for li, res in enumerate(range(3, log_size + 1)):
            feat = feat + skips[li]
            feat = ResBlock(_chan(2**res, cs), "up", name=f"up{li}")(feat)
            ch = _chan(2**res, cs)
            # the scale/shift first convs share `feat`: ONE matmul with the
            # kernels concatenated along out-channels. MXU tile passes go as
            # ceil(N/128), so N=2ch costs the same passes as N=ch — two
            # convs for the price of one (the converter packs the torch
            # condition_scale.{li}.0 / condition_shift.{li}.0 weights into
            # cond_a{li}, train/weights.py)
            ab = Conv(2 * ch, (3, 3), padding=1, name=f"cond_a{li}")(feat)
            scale = Conv(ch, (3, 3), padding=1,
                         name=f"cond_scale{li}b")(leaky_relu(ab[..., :ch]))
            shift = Conv(ch, (3, 3), padding=1,
                         name=f"cond_shift{li}b")(leaky_relu(ab[..., ch:]))
            conditions.extend([scale, shift])

        image = StyleGAN2GeneratorCSFT(
            out_size=self.out_size,
            out_dim=self.out_dim,
            style_dim=self.style_dim,
            num_mlp=self.num_mlp,
            channel_scale=cs,
            small=self.small,
            name="generator",
        )(style, conditions, rng=rng)
        if self.activation:
            image = nn.sigmoid(image)
        return image


class SimpleUNet(nn.Module):
    """(ref: styleunet.py:9-84)."""

    in_size: int
    out_size: int
    in_dim: int
    out_dim: int
    channel_scale: float = 1.0

    @nn.compact
    def __call__(self, x, extra_style=None, rng=None):
        del extra_style, rng
        cs = self.channel_scale
        log_size = int(math.log2(self.out_size))
        if x.shape[1] < self.out_size:
            x = resize_bilinear(x, (self.out_size, self.out_size))
        if self.in_size <= self.out_size:
            feat = leaky_relu(Conv(_chan(self.out_size, cs), (1, 1), name="first")(x))
        else:
            feat = leaky_relu(Conv(_chan(self.in_size, cs), (1, 1), name="first")(x))
            feat = ResBlock(_chan(self.out_size, cs), "down", name="first_down")(feat)
        skips = []
        for li, res in enumerate(range(log_size, 2, -1)):
            feat = ResBlock(_chan(2 ** (res - 1), cs), "down", name=f"down{li}")(feat)
            skips.insert(0, feat)
        feat = leaky_relu(Conv(_chan(4, cs), (3, 3), padding=1, name="final_conv")(feat))
        for li, res in enumerate(range(3, log_size + 1)):
            feat = feat + skips[li]
            feat = ResBlock(_chan(2**res, cs), "up", name=f"up{li}")(feat)
        return Conv(self.out_dim, (1, 1), name="to_rgb")(feat)
