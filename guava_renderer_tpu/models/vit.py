"""DINOv2-style Vision Transformer (flax.linen, NHWC in, tokens out).

Architecture-parity with the frozen `dinov2_vitb14` backbone the reference
pulls from torch.hub (ref: models/modules/net_module/dino_encoder.py:11,71):
14x14 patch embed, CLS token, interpolated position embeddings, pre-LN
blocks with LayerScale, GELU MLP, and `intermediate_layers(n)` returning the
final-norm'ed outputs of the last n blocks. Weights are loadable from a
converted torch checkpoint; with no checkpoint the encoder trains/evaluates
with random init (the container has no hub access).

TPU notes: attention over 37x37+1 tokens is tiny — plain dot-product
attention lowers to clean MXU matmuls; the whole backbone runs in bf16 with
f32 layernorm accumulation.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_bilinear


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, D // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = jnp.swapaxes(q, 1, 2)  # (B, H, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        scale = (D // self.num_heads) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.dtype, name="attn")(h)
        x = x + LayerScale(self.dim, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp")(h)
        return x + LayerScale(self.dim, name="ls2")(h)


class VisionTransformer(nn.Module):
    """ViT-B/14 defaults; `__call__` returns the last `num_intermediate`
    block outputs (final-norm applied), each (B, 1+N, D) with CLS first."""

    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    pos_grid: int = 37          # stored position-embedding grid side
    num_intermediate: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        """images: (B, H, W, 3), H/W multiples of patch_size."""
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.pos_grid * self.pos_grid, self.dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            grid = pos_patch.reshape(1, self.pos_grid, self.pos_grid, self.dim)
            grid = resize_bilinear(grid, (gh, gw))
            pos_patch = grid.reshape(1, gh * gw, self.dim)

        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1).astype(x.dtype)

        keep_from = self.depth - self.num_intermediate
        outs = []
        for i in range(self.depth):
            x = Block(self.dim, self.num_heads, dtype=self.dtype, name=f"block{i}")(x)
            if i >= keep_from:
                outs.append(x)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        return [norm(o.astype(jnp.float32)) for o in outs]
