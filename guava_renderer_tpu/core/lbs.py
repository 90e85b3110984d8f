"""Linear blend skinning core (pure jnp, static-shape, jit/vmap-clean).

Capability parity with the reference's duplicated LBS stacks
(ref: models/modules/flame/lbs.py:142-333, models/modules/smplx/lbs.py), built
once as stateless functions over PyTrees. TPU-first design choices:

* The sequential 55-joint kinematic-chain loop (ref: flame/lbs.py:426-483)
  becomes **level-batched rigid composition**: joints are grouped by tree
  depth at trace time (parents are static), so the chain is O(depth) batched
  4x4 matmuls instead of O(J) sequential steps.
* Skinning weights x joint transforms is a single (V,J)@(J,16) matmul that
  XLA tiles onto the MXU.
* One `lbs` entry point covers the reference's `lbs`, `lbs_wobeta`, and
  `lbs_get_transform` variants via what it returns (a rich LbsResult).

All functions accept a leading batch dimension B.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import axis_angle_to_matrix

_HI = jax.lax.Precision.HIGHEST


class LbsResult(NamedTuple):
    vertices: jnp.ndarray        # (B, V, 3) posed vertices
    joints_rest: jnp.ndarray     # (B, J, 3) rest-pose joints (after shape)
    joints_posed: jnp.ndarray    # (B, J, 3) posed joints
    joint_transforms: jnp.ndarray  # (B, J, 4, 4) world-from-rest per joint (A)
    vertex_transforms: jnp.ndarray  # (B, V, 4, 4) world-from-rest per vertex (T)


def blend_shapes(coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """coeffs (B, L) x dirs (V, 3, L) -> per-vertex offsets (B, V, 3)."""
    return jnp.einsum("bl,vcl->bvc", coeffs, dirs, precision=_HI)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """J_regressor (J, V) x vertices (B, V, 3) -> joints (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", J_regressor, vertices, precision=_HI)


def kinematic_levels(parents: Sequence[int]) -> list[np.ndarray]:
    """Group joint indices by depth in the kinematic tree (root excluded).

    parents[0] must be the root (parent -1 or 0). Returns a list of
    index arrays; every joint's parent lives in an earlier level.
    """
    parents = np.asarray(parents)
    depth = np.zeros(len(parents), dtype=np.int64)
    for i in range(1, len(parents)):
        depth[i] = depth[parents[i]] + 1
    levels = []
    for d in range(1, int(depth.max()) + 1):
        levels.append(np.nonzero(depth == d)[0])
    return levels


def rigid_transform_chain(
    rot_mats: jnp.ndarray,
    joints_rest: jnp.ndarray,
    parents: Sequence[int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose the kinematic chain.

    Args:
      rot_mats: (B, J, 3, 3) local joint rotations.
      joints_rest: (B, J, 3) rest-pose joint locations.
      parents: static parent indices, parents[0] is the root.

    Returns:
      joints_posed: (B, J, 3)
      rel_transforms: (B, J, 4, 4) — maps rest-pose points rigidly attached to
        joint j to posed space ("A" in SMPL notation: world transform with the
        rest-joint offset removed).
    """
    parents_np = np.asarray(parents)
    B, J = rot_mats.shape[:2]

    # local translations: joint position relative to parent in rest pose.
    # Joint 0 is always the root (its "parent" is the world origin),
    # regardless of whether parents[0] is coded as -1 or 0.
    parent_pos = joints_rest[:, np.maximum(parents_np, 0)]
    parent_pos = parent_pos.at[:, 0].set(0.0)
    rel_j = joints_rest - parent_pos

    # local 4x4s
    local = jnp.zeros((B, J, 4, 4), dtype=rot_mats.dtype)
    local = local.at[:, :, :3, :3].set(rot_mats)
    local = local.at[:, :, :3, 3].set(rel_j)
    local = local.at[:, :, 3, 3].set(1.0)

    # level-batched composition: world[j] = world[parent[j]] @ local[j]
    world = local  # level-0 (root) is already world
    for idx in kinematic_levels(parents_np):
        par = parents_np[idx]
        composed = jnp.matmul(world[:, par], local[:, idx], precision=_HI)
        world = world.at[:, idx].set(composed)

    joints_posed = world[:, :, :3, 3]

    # remove rest-pose joint offset: A = world @ [I | -j_rest]
    t_correct = jnp.einsum("bjrc,bjc->bjr", world[:, :, :3, :3], joints_rest, precision=_HI)
    rel = world.at[:, :, :3, 3].add(-t_correct)
    return joints_posed, rel


def skinning_transforms(rel_transforms: jnp.ndarray, lbs_weights: jnp.ndarray) -> jnp.ndarray:
    """Blend per-joint transforms into per-vertex transforms.

    rel_transforms (B, J, 4, 4) x lbs_weights (V, J) -> (B, V, 4, 4).
    Lowered as a (V, J) @ (B*J, 16) matmul for the MXU.
    """
    B, J = rel_transforms.shape[:2]
    A_flat = rel_transforms.reshape(B, J, 16)
    T = jnp.einsum("vj,bjk->bvk", lbs_weights, A_flat, precision=_HI)
    return T.reshape(B, -1, 4, 4)


def apply_vertex_transforms(vertices: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply (B, V, 4, 4) to (B, V, 3)."""
    return (
        jnp.einsum("bvrc,bvc->bvr", T[:, :, :3, :3], vertices, precision=_HI)
        + T[:, :, :3, 3]
    )


def pose_feature(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """(R_j - I) for joints 1.., flattened: (B, J, 3, 3) -> (B, (J-1)*9)."""
    B = rot_mats.shape[0]
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    return (rot_mats[:, 1:] - eye).reshape(B, -1)


def lbs(
    pose: jnp.ndarray,
    v_template: jnp.ndarray,
    joints_rest: jnp.ndarray | None,
    parents: Sequence[int],
    lbs_weights: jnp.ndarray,
    *,
    betas: jnp.ndarray | None = None,
    shapedirs: jnp.ndarray | None = None,
    posedirs: jnp.ndarray | None = None,
    J_regressor: jnp.ndarray | None = None,
    pose2rot: bool = True,
) -> LbsResult:
    """Full LBS forward.

    Args:
      pose: (B, J, 3) axis-angle or (B, J, 3, 3) rotation matrices.
      v_template: (V, 3) or (B, V, 3) template vertices (pre-shape).
      joints_rest: (B, J, 3) rest joints; if None, regressed via J_regressor
        from the shaped template.
      parents: static kinematic tree.
      lbs_weights: (V, J).
      betas/shapedirs: optional shape blendshapes added to the template.
      posedirs: optional pose-corrective blendshapes, (V, 3, (J-1)*9) layout.
      J_regressor: (J, V), required when joints_rest is None.
      pose2rot: whether `pose` is axis-angle.

    Covers the reference's `lbs` (betas path), `lbs_wobeta`
    (v_template already shaped, joints precomputed), and
    `lbs_get_transform` (consume .joint_transforms / .vertex_transforms).
    """
    if pose2rot:
        rot_mats = axis_angle_to_matrix(pose)
    else:
        rot_mats = pose
    B = rot_mats.shape[0]

    if v_template.ndim == 2:
        v_shaped = jnp.broadcast_to(v_template, (B,) + v_template.shape)
    else:
        v_shaped = v_template
    if betas is not None and shapedirs is not None:
        v_shaped = v_shaped + blend_shapes(betas, shapedirs)

    if joints_rest is None:
        assert J_regressor is not None, "need J_regressor when joints_rest is None"
        joints_rest = vertices2joints(J_regressor, v_shaped)

    if posedirs is not None:
        pf = pose_feature(rot_mats)  # (B, (J-1)*9)
        v_shaped = v_shaped + jnp.einsum(
            "bl,vcl->bvc", pf, posedirs, precision=_HI
        )

    joints_posed, rel = rigid_transform_chain(rot_mats, joints_rest, parents)
    T = skinning_transforms(rel, lbs_weights)
    verts = apply_vertex_transforms(v_shaped, T)
    return LbsResult(verts, joints_rest, joints_posed, rel, T)


def vertices2landmarks(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    lmk_faces_idx: jnp.ndarray,
    lmk_bary_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric landmark extraction.

    vertices (B, V, 3), faces (F, 3) int, lmk_faces_idx (B, L) or (L,),
    lmk_bary_coords (B, L, 3) or (L, 3) -> (B, L, 3).
    """
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = lmk_faces_idx[None].repeat(vertices.shape[0], axis=0)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = lmk_bary_coords[None].repeat(vertices.shape[0], axis=0)
    tri_vids = faces[lmk_faces_idx]  # (B, L, 3)
    tri_verts = jax.vmap(lambda v, f: v[f])(vertices, tri_vids)  # (B, L, 3, 3)
    return jnp.einsum("blvc,blv->blc", tri_verts, lmk_bary_coords, precision=_HI)
