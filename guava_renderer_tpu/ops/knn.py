"""k-nearest-neighbor mean squared distance (simple-knn parity).

The reference's distCUDA2 (ref: submodules/simple-knn/simple_knn.cu:46-71,
spatial.cu:15-26) returns the mean squared distance of each point to its 3
nearest neighbors, computed approximately via a Morton-order spatial sort +
box culling. It is the standard 3DGS scale initializer; GUAVA itself never
calls it (SURVEY §2.2) — provided for capability parity.

TPU design: exact blocked O(P^2) for small P; for large P the same
Morton-sort locality idea, vectorized — each point looks at a +-W window in
Morton order (one (P, 2W) distance matrix, no sorting network, no atomics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pairwise_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) x (M, 3) -> (N, M) squared distances."""
    an = jnp.sum(a * a, -1, keepdims=True)
    bn = jnp.sum(b * b, -1, keepdims=True).T
    return jnp.maximum(an + bn - 2.0 * jnp.matmul(a, b.T, precision=_HI), 0.0)


def knn_mean_sq_dist_exact(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Exact: (P, 3) -> (P,) mean squared distance to the k nearest others."""
    d2 = _pairwise_sq(points, points)
    P = points.shape[0]
    d2 = jnp.where(jnp.eye(P, dtype=bool), jnp.inf, d2)  # exclude self
    neg_top, _ = jax.lax.top_k(-d2, k)
    return jnp.mean(-neg_top, axis=-1)


def _morton3(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit quantized xyz (P, 3) uint32 -> (P,) morton codes."""

    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3, window: int = 16) -> jnp.ndarray:
    """Approximate (P, 3) -> (P,): Morton-window kNN (exact for P <= 2048)."""
    P = points.shape[0]
    if P <= 2048:
        return knn_mean_sq_dist_exact(points, k)
    lo = points.min(0)
    hi = points.max(0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0).astype(jnp.uint32)
    codes = _morton3(q).astype(jnp.int32)
    order = jnp.argsort(codes)
    sorted_pts = points[order]

    # each point vs a +-window neighborhood in morton order
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    idx = jnp.clip(jnp.arange(P)[:, None] + offs[None, :], 0, P - 1)  # (P, 2W)
    neigh = sorted_pts[idx]                                            # (P, 2W, 3)
    d2 = jnp.sum((sorted_pts[:, None, :] - neigh) ** 2, axis=-1)
    # clipped self-indices produce zeros at the boundary; mask them out
    self_mask = idx == jnp.arange(P)[:, None]
    d2 = jnp.where(self_mask, jnp.inf, d2)
    neg_top, _ = jax.lax.top_k(-d2, k)
    mean_sorted = jnp.mean(-neg_top, axis=-1)
    # scatter back to the original order
    out = jnp.zeros(P, points.dtype)
    return out.at[order].set(mean_sorted)
