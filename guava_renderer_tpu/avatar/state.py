"""Avatar state: Gaussians bound to the EHM mesh, as a plain PyTree.

Replaces the reference's `Ubody_Gaussian` nn.Module
(ref: models/UbodyAvatar/ubody_gaussian.py:162-313) with data: the avatar is
what `create_avatar.py` serializes, so here it is a NamedTuple of arrays —
orbax-serializable, shardable, jit-transparent.

Static-shape design (TPU): the reference prunes low-opacity UV Gaussians
dynamically (ubody_gaussian.py:229-243); we instead keep the full masked UV
grid with opacity forced to 0 outside the chart / below threshold, and
provide `prune_avatar` as an *offline numpy compaction* for export paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GaussianAvatar(NamedTuple):
    """One identity's Gaussians (batch dim B kept, usually 1)."""

    # vertex-bound set (positions = canonical template vertices)
    vtx_positions: jnp.ndarray     # (B, V, 3)
    vtx_colors: jnp.ndarray        # (B, V, 32) — first 3 channels sigmoided
    vtx_opacity: jnp.ndarray       # (B, V, 1)
    vtx_scales: jnp.ndarray        # (B, V, 3)
    vtx_rotations: jnp.ndarray     # (B, V, 4) wxyz
    # uv-bound set (full masked chart, static N_uv)
    uv_local_xyz: jnp.ndarray      # (B, N, 3)
    uv_colors: jnp.ndarray         # (B, N, 32)
    uv_opacity: jnp.ndarray        # (B, N, 1) — 0 outside chart
    uv_scales: jnp.ndarray         # (B, N, 3)
    uv_rotations: jnp.ndarray      # (B, N, 4)
    uv_binding_face: jnp.ndarray   # (N,) i32
    uv_face_bary: jnp.ndarray      # (N, 3)
    uv_valid: jnp.ndarray          # (N,) bool — chart mask


class GaussianSet(NamedTuple):
    """Deformed, render-ready Gaussians (vertex + uv concatenated)."""

    xyz: jnp.ndarray         # (B, P, 3)
    rotation: jnp.ndarray    # (B, P, 4)
    scaling: jnp.ndarray     # (B, P, 3)
    opacity: jnp.ndarray     # (B, P, 1)
    colors: jnp.ndarray      # (B, P, 32)
    sh_degree: int = 0


def prune_avatar(
    avatar: GaussianAvatar,
    opacity_threshold: float = 0.001,
    pad_to_multiple: int | None = 4096,
) -> GaussianAvatar:
    """Offline compaction for export (batch-1, numpy; not jittable).

    Mirrors the reference's prune_gaussians (ubody_gaussian.py:229-243).
    `pad_to_multiple` pads the kept set with zero-opacity invalid entries so
    the UV count lands on a shape bucket — different identities then share
    one jit trace of the per-frame render path instead of recompiling."""
    a = {k: np.asarray(v) for k, v in avatar._asdict().items()}
    keep = (a["uv_opacity"][0, :, 0] > opacity_threshold) & a["uv_valid"]
    out = dict(a)
    for k in ("uv_local_xyz", "uv_colors", "uv_opacity", "uv_scales", "uv_rotations"):
        out[k] = a[k][:, keep]
    out["uv_binding_face"] = a["uv_binding_face"][keep]
    out["uv_face_bary"] = a["uv_face_bary"][keep]
    n = int(keep.sum())
    out["uv_valid"] = np.ones(n, bool)
    if pad_to_multiple:
        # Round up to the bucket, but never beyond the unpruned count — the
        # original shape is itself a valid (already traced) shape, so tiny
        # avatars don't grow.
        target = -(-max(n, 1) // pad_to_multiple) * pad_to_multiple
        target = min(target, a["uv_local_xyz"].shape[1])
        pad = max(0, target - n)
        if pad:
            for k in ("uv_local_xyz", "uv_colors", "uv_opacity", "uv_scales", "uv_rotations"):
                w = [(0, 0)] * out[k].ndim
                w[1] = (0, pad)
                out[k] = np.pad(out[k], w)
            # identity quats / tiny scales in the pad region: zero-opacity
            # culls them, but keep the math NaN-free (quat normalization)
            out["uv_rotations"][:, n:, 0] = 1.0
            out["uv_scales"][:, n:] = 1e-6
            out["uv_binding_face"] = np.pad(out["uv_binding_face"], (0, pad))
            out["uv_face_bary"] = np.pad(out["uv_face_bary"], ((0, pad), (0, 0)))
            out["uv_valid"] = np.pad(out["uv_valid"], (0, pad))
    return GaussianAvatar(**{k: jnp.asarray(v) for k, v in out.items()})


def num_gaussians(avatar: GaussianAvatar) -> int:
    return avatar.vtx_positions.shape[1] + avatar.uv_local_xyz.shape[1]
