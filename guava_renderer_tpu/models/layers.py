"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x, slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False, antialias: bool = True):
    """NHWC bilinear resize.

    align_corners=False matches torch's F.interpolate default (half-pixel
    centers, what jax.image.resize implements). align_corners=True is
    implemented as two small interpolation matmuls (TPU-friendly).
    antialias only matters when downscaling: torch F.interpolate defaults to
    False (plain bilinear taps), torchvision's resize uses True (filtered);
    jax.image.resize's default is True — callers matching an F.interpolate
    site must pass antialias=False.
    """
    H, W = x.shape[1], x.shape[2]
    h, w = size
    if (H, W) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(
            x, (x.shape[0], h, w, x.shape[3]), method="bilinear", antialias=antialias
        )
    wy = _ac_weights(H, h, x.dtype)  # (h, H)
    wx = _ac_weights(W, w, x.dtype)  # (w, W)
    x = jnp.einsum("bhwc,oh->bowc", x, wy)
    return jnp.einsum("bhwc,ow->bhoc", x, wx)


def _ac_weights(n_in: int, n_out: int, dtype) -> jnp.ndarray:
    """Dense align-corners linear-interpolation matrix (n_out, n_in)."""
    if n_out == 1 or n_in == 1:
        return jnp.full((n_out, n_in), 1.0 / n_in, dtype)
    pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = (pos - lo).astype(dtype)
    w = jnp.zeros((n_out, n_in), dtype)
    rows = jnp.arange(n_out)
    w = w.at[rows, lo].set(1.0 - frac)
    w = w.at[rows, lo + 1].add(frac)
    return w


def upsample2x(x):
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


def downsample2x(x):
    """Exact torch parity: F.interpolate(scale=0.5, bilinear, antialias=False)
    at an exact 2x ratio samples at 2o+0.5 in each dim — a 2x2 mean pool.
    (jax.image.resize would antialias with a wider kernel.)"""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


class ResBlock(nn.Module):
    """Bilinear up/down residual block (ref: styleunet.py:410-441)."""

    out_channels: int
    mode: str = "down"  # 'down' | 'up'

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = leaky_relu(nn.Conv(in_ch, (3, 3), padding=1)(x))
        out = downsample2x(out) if self.mode == "down" else upsample2x(out)
        out = leaky_relu(nn.Conv(self.out_channels, (3, 3), padding=1)(out))
        skip = downsample2x(x) if self.mode == "down" else upsample2x(x)
        skip = nn.Conv(self.out_channels, (1, 1), use_bias=False)(skip)
        return out + skip


class ConvSeq(nn.Module):
    """conv -> leaky -> conv [-> leaky -> conv ...] helper."""

    features: tuple
    kernels: tuple
    slope: float = 0.2
    final_act: bool = False

    @nn.compact
    def __call__(self, x):
        for i, (f, k) in enumerate(zip(self.features, self.kernels)):
            x = nn.Conv(f, (k, k), padding=k // 2)(x)
            if i < len(self.features) - 1 or self.final_act:
                x = leaky_relu(x, self.slope)
        return x


def harmonic_embedding(x: jnp.ndarray, n_freqs: int = 4, include_input: bool = True):
    """Positional encoding matching pytorch3d's HarmonicEmbedding defaults:
    [sin(2^0 x) ... sin(2^{n-1} x), cos(...), x] -> dim = d*(2*n+1).
    For direction vectors d=3, n=4 -> 27 (ref: ubody_gaussian.py:44,124-125)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., n, d)
    emb = jnp.concatenate(
        [jnp.sin(xb).reshape(*x.shape[:-1], -1), jnp.cos(xb).reshape(*x.shape[:-1], -1)],
        axis=-1,
    )
    if include_input:
        emb = jnp.concatenate([emb, x], axis=-1)
    return emb
