"""SSIM — separable 11x11 Gaussian window, fully differentiable.

Parity with the reference's cal_ssim / fused-ssim
(ref: utils/loss_utils.py:19-63, submodules/fused-ssim/ssim.cu:9-18): same
window (sigma 1.5), same C1/C2, same zero-padded convolution.

TPU note: the CUDA "fused" kernel exists to avoid kernel-launch and memory
round-trips; on TPU, XLA fuses the separable depthwise convolutions and the
elementwise SSIM map into a couple of fused loops on its own, so this IS the
fused implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01**2
C2 = 0.03**2


@functools.lru_cache
def _gauss_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, zero ('same') padding. x: (B, H, W, C)."""
    w = jnp.asarray(_gauss_window(window_size))
    C = x.shape[-1]
    kh = jnp.broadcast_to(w[:, None, None, None], (window_size, 1, 1, C))
    kv = jnp.broadcast_to(w[None, :, None, None], (1, window_size, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    pad = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=C,
    )
    return jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=C,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """img1/img2: (B, H, W, C) in [0, 1]."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1, window_size) - mu1_sq
    s2 = _blur(img2 * img2, window_size) - mu2_sq
    s12 = _blur(img1 * img2, window_size) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-item PSNR (B,) (ref: loss_utils.py:68-70)."""
    mse = jnp.mean((img1 - img2) ** 2, axis=tuple(range(1, img1.ndim)))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def mae(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img1 - img2))
