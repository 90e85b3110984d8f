"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def leaky_relu(x, slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


@functools.lru_cache(maxsize=None)
def _halfpix_weights(n_in: int, n_out: int, antialias: bool) -> np.ndarray:
    """(n_out, n_in) half-pixel bilinear interpolation matrix — a pure-numpy
    replica of jax.image's `compute_weight_mat` (triangle kernel, half-pixel
    centers, antialias widening on downscale, row normalization, out-of-
    range zeroing), pinned equal to jax.image.resize by test_layers_fast.
    Bilinear resize is separable and linear, so two einsums with these
    matrices reproduce jax.image.resize while lowering to MXU matmuls:
    on-chip, jax.image.resize(512->256, antialias) measured 17.1 ms vs
    ~0.0 ms for the matmul form (tpu_diag_r8 refiner2/3). Pure numpy — a
    jax-built matrix would become a tracer under jit."""
    scale = n_out / n_in
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0) if antialias else 1.0
    sample_f = (np.arange(n_out, dtype=np.float64) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[:, None] - np.arange(n_in, dtype=np.float64)[None, :])
    w = np.maximum(0.0, 1.0 - x / kernel_scale)
    total = w.sum(axis=1, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total == 0, 1, total), 0.0)
    in_range = (sample_f >= -0.5) & (sample_f <= n_in - 0.5)
    return (w * in_range[:, None]).astype(np.float32)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False, antialias: bool = True):
    """NHWC bilinear resize as two interpolation-matrix einsums.

    align_corners=False matches torch's F.interpolate default (half-pixel
    centers, jax.image.resize semantics — the weight matrices are extracted
    from jax.image.resize itself, see _halfpix_weights). antialias only
    matters when downscaling: torch F.interpolate defaults to False (plain
    bilinear taps), torchvision's resize uses True (filtered); callers
    matching an F.interpolate site must pass antialias=False.
    """
    H, W = x.shape[1], x.shape[2]
    h, w = size
    if (H, W) == (h, w):
        return x
    if align_corners:
        wy = _ac_weights(H, h, x.dtype)  # (h, H)
        wx = _ac_weights(W, w, x.dtype)  # (w, W)
    else:
        wy = jnp.asarray(_halfpix_weights(H, h, antialias), x.dtype)
        wx = jnp.asarray(_halfpix_weights(W, w, antialias), x.dtype)
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


class Conv(nn.Module):
    """nn.Conv drop-in that lowers stride-1 SAME convs as im2col + one
    matmul.

    XLA's native conv at the refiner's channel widths runs ~5x slower than
    the explicit formulation (512^2 x 16ch 3x3: 2.5 ms native vs 0.5 ms
    im2col-matmul, outputs/bench/tpu_diag_r8.log refiner3). Param tree is
    identical to nn.Conv ({kernel (kh,kw,C,O), bias (O,)}) and the class is
    deliberately named `Conv` so flax auto-naming produces the same
    "Conv_N" paths — checkpoints and the torch weight converter are
    unaffected. Strided/dilated/grouped calls fall back to
    lax.conv_general_dilated with the same params.
    """

    features: int
    kernel_size: tuple
    strides: tuple | int | None = None
    padding: int | str | tuple = "SAME"
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        if bias is None:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        else:
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)

        strides = self.strides or (1, 1)
        if isinstance(strides, int):
            strides = (strides, strides)
        pad = self.padding
        same_pad = (
            pad == "SAME"
            or (isinstance(pad, int) and (pad == kh // 2 and pad == kw // 2))
        )
        if strides == (1, 1) and same_pad and kh == kw and kh % 2 == 1:
            B, H, W, _ = x.shape
            if kh == 1:
                out = x @ kernel[0, 0]
            else:
                p = kh // 2
                xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
                cols = jnp.concatenate(
                    [xp[:, dy:dy + H, dx:dx + W]
                     for dy in range(kh) for dx in range(kw)], axis=-1,
                )
                out = cols @ kernel.reshape(kh * kw * cin, self.features)
        else:
            if isinstance(pad, int):
                pad = [(pad, pad), (pad, pad)]
            out = jax.lax.conv_general_dilated(
                x, kernel, strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            out = out + bias
        return out


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
        out = leaky_relu(Conv(in_ch, (3, 3), padding=1)(x))
        out = downsample2x(out) if self.mode == "down" else upsample2x(out)
        out = leaky_relu(Conv(self.out_channels, (3, 3), padding=1)(out))
        skip = downsample2x(x) if self.mode == "down" else upsample2x(x)
        skip = Conv(self.out_channels, (1, 1), use_bias=False)(skip)
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
            x = Conv(f, (k, k), padding=k // 2)(x)
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
