"""FLAME-specific extras: texture PCA space, head-index sets, and
FLAME-level teeth grafting.

Parity targets (ref: models/modules/flame/FLAME.py):
* texture PCA space (:150-162) — mean + 200 principal components over the
  512x512x3 FLAME 2020 texture chart, stored /255.
* head_index (:164-168) — all FLAME vertex ids minus an optional
  `selected_lowerhead.npy` exclusion mask; teeth ids appended after a graft.
* add_teeth (:357-497) — the FLAME-topology variant of the teeth graft
  (upper rows skinned to the neck joint, lower rows to the jaw joint);
  geometry construction is shared with the SMPL-X/EHM graft in
  bodymodel/teeth.py.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from .data import ParametricModelData
from .teeth import ROWS, graft_teeth_model, teeth_uv_block

# FLAME joint ids (ref: FLAME.py:476-479 "move with neck / jaw")
FLAME_NECK_JOINT = 1
FLAME_JAW_JOINT = 2


class FlameTexSpace(NamedTuple):
    """PCA texture space, values in [0, 1] (stored /255)."""

    mean: np.ndarray    # (H*W*3,) f32
    basis: np.ndarray   # (H*W*3, n_pc) f32
    size: int = 512


def load_flame_texture(path: str, n_pc: int = 200) -> FlameTexSpace:
    """FLAME2020/FLAME_texture.npz -> texture space (ref: FLAME.py:150-162)."""
    tex = np.load(path)
    mean = np.asarray(tex["mean"], np.float32).reshape(-1) / 255.0
    basis = np.asarray(tex["tex_dir"], np.float32).reshape(-1, n_pc)[:, :n_pc] / 255.0
    size = int(round((mean.shape[0] / 3) ** 0.5))
    return FlameTexSpace(mean=mean, basis=basis, size=size)


def synthetic_flame_texture(size: int = 16, n_pc: int = 8, seed: int = 0) -> FlameTexSpace:
    rng = np.random.default_rng(seed)
    return FlameTexSpace(
        mean=rng.uniform(0.2, 0.8, size * size * 3).astype(np.float32),
        basis=(rng.normal(size=(size * size * 3, n_pc)) * 0.05).astype(np.float32),
        size=size,
    )


def flame_texture(tex_params, space: FlameTexSpace):
    """(B, n_pc) PCA coefficients -> (B, H, W, 3) albedo in [0, 1].

    jnp-friendly: one matmul + reshape (the decode the reference leaves
    implicit in its registered buffers)."""
    import jax.numpy as jnp

    mean = jnp.asarray(space.mean)
    basis = jnp.asarray(space.basis)
    n = tex_params.shape[-1]
    flat = mean[None] + tex_params @ basis[:, :n].T
    B = tex_params.shape[0]
    return jnp.clip(flat.reshape(B, space.size, space.size, 3), 0.0, 1.0)


def flame_head_index(
    num_vertices: int, lowerhead_mask_path: str | None = None
) -> np.ndarray:
    """Head vertex-id set: everything minus the lower-head exclusion list
    (ref: FLAME.py:164-168)."""
    idx = np.arange(num_vertices, dtype=np.int64)
    if lowerhead_mask_path and os.path.exists(lowerhead_mask_path):
        excl = np.load(lowerhead_mask_path)
        idx = idx[~np.isin(idx, excl)]
    return idx


def add_teeth_flame(
    data: ParametricModelData,
    texcoords: np.ndarray | None = None,
    faces_uv_idx: np.ndarray | None = None,
    head_index: np.ndarray | None = None,
):
    """FLAME-level teeth graft (ref: FLAME.py:357-497).

    Appends the 8x15 teeth rows to the FLAME template, skins upper rows to
    the neck joint and lower rows to the jaw joint, extends the UV chart
    with the teeth strip, and appends the new ids to head_index.

    Returns (new_data, info) where info has 'row_ids', 'vid_teeth',
    'vid_teeth_upper', 'vid_teeth_lower', 'head_index', 'texcoords',
    'faces_uv_idx'."""
    from .flame_regions import LIP_OUTSIDE_RING_LOWER, LIP_OUTSIDE_RING_UPPER

    new_data, row_ids = graft_teeth_model(
        data,
        np.asarray(LIP_OUTSIDE_RING_UPPER),
        np.asarray(LIP_OUTSIDE_RING_LOWER),
        upper_joint=FLAME_NECK_JOINT,
        lower_joint=FLAME_JAW_JOINT,
    )
    upper_rows = ("upper_root", "upper_edge", "upper_root_back", "upper_edge_back")
    vid_upper = np.concatenate([row_ids[k] for k in ROWS if k in upper_rows])
    vid_lower = np.concatenate([row_ids[k] for k in ROWS if k not in upper_rows])
    vid_teeth = np.concatenate([row_ids[k] for k in ROWS])

    info = {
        "row_ids": row_ids,
        "vid_teeth": vid_teeth,
        "vid_teeth_upper": vid_upper,
        "vid_teeth_lower": vid_lower,
    }
    if head_index is None:
        head_index = np.arange(data.num_vertices, dtype=np.int64)
    info["head_index"] = np.concatenate([head_index, vid_teeth.astype(np.int64)])

    if texcoords is not None and faces_uv_idx is not None:
        n = len(LIP_OUTSIDE_RING_UPPER)
        uv_block = teeth_uv_block(n)
        T0 = texcoords.shape[0]
        V0 = data.num_vertices
        new_faces = new_data.faces[data.faces.shape[0]:]
        info["texcoords"] = np.concatenate([texcoords, uv_block])
        info["faces_uv_idx"] = np.concatenate(
            [faces_uv_idx, (new_faces - V0 + T0).astype(np.int32)]
        )
    return new_data, info
