"""EHM — Expressive Human Model (SMPL-X body + FLAME head hybrid).

Behavioral parity with the reference EHM (ref: models/modules/ehm/EHM.py:14-156),
re-designed as a pure function over a frozen model PyTree:

1. FLAME branch: zero global+neck pose, LBS with shape+expr+jaw+eye, add
   eyelid blendshapes, apply per-axis head_scale about the FLAME origin.
2. SMPL-X branch: shape blendshapes -> template; per-identity joints_offset.
3. Graft the posed FLAME head into the shaped body template, anchored by the
   mean eye joints (FLAME joints 3:5 vs SMPL-X joints 23:25), then apply
   hand_scale about the template hand centroids.
4. LBS (shape-free) on the fused template -> vertices, per-vertex 4x4
   transforms (used to rotate vertex-bound Gaussians), per-joint transforms.

The template grafting at init (FLAME head template aligned into the SMPL-X
template, ref: EHM.py:24-28) happens once in `EhmModel.build`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lbs as lbs_core
from ..core.rotations import axis_angle_to_matrix
from .data import ParametricModelData, SmplxExtras

# SMPL-X joint ids (public kinematic layout)
J_NECK, J_LWRIST, J_RWRIST, J_JAW, J_LEYE, J_REYE = 12, 20, 21, 22, 23, 24
# FLAME joint ids
F_NECK, F_JAW, F_LEYE, F_REYE = 1, 2, 3, 4


class BodyParams(NamedTuple):
    """SMPL-X-side inputs. Poses are (B, n, 3) axis-angle or (B, n, 3, 3) rotmats."""

    shape: jnp.ndarray                      # (B, <=n_shape)
    body_pose: jnp.ndarray                  # (B, 21, ...)
    global_pose: jnp.ndarray | None = None  # (B, 1, ...)
    left_hand_pose: jnp.ndarray | None = None   # (B, 15, ...)
    right_hand_pose: jnp.ndarray | None = None  # (B, 15, ...)
    exp: jnp.ndarray | None = None          # (B, n_exp)
    joints_offset: jnp.ndarray | None = None    # (B, 55, 3)
    head_scale: jnp.ndarray | None = None   # (B, 3) or (B, 1)
    hand_scale: jnp.ndarray | None = None   # (B, 3) or (B, 1)
    static_offset: jnp.ndarray | None = None    # (B, V, 3)


class FlameParams(NamedTuple):
    """FLAME-side inputs; poses are axis-angle."""

    shape: jnp.ndarray                      # (B, <=n_shape)
    exp: jnp.ndarray                        # (B, n_exp)
    jaw: jnp.ndarray                        # (B, 3)
    # (B, 6) [left(0:3), right(3:6)] axis-angle: channels feed FLAME joints
    # 3/4, which the EHM graft aligns with SMPL-X left_eye_smplx(23)/
    # right_eye_smplx(24) (ref: EHM.py:24-28,63, SMPLX.py:33); golden-tested
    # in tests/test_ehm_eyes.py.
    eyes: jnp.ndarray | None = None
    eyelids: jnp.ndarray | None = None      # (B, 2) [left, right] (ref: EHM.py:73-74)


class EhmResult(NamedTuple):
    vertices: jnp.ndarray            # (B, V, 3)
    joints_rest: jnp.ndarray         # (B, 55, 3) t-pose joints (after offset)
    joints_posed: jnp.ndarray        # (B, 55, 3)
    vertex_transforms: jnp.ndarray   # (B, V, 4, 4)
    joint_transforms: jnp.ndarray    # (B, 55, 4, 4)
    template: jnp.ndarray            # (B, V, 3) fused rest template (pre-LBS)


class EhmModel(NamedTuple):
    """Frozen EHM assets: device arrays + static host metadata."""

    smplx: dict[str, Any]            # jnp arrays (v_template, shapedirs, ...)
    flame: dict[str, Any]
    smplx_parents: tuple             # static
    flame_parents: tuple
    smplx2flame_ind: jnp.ndarray     # (Vf,) i32
    left_hand_ind: jnp.ndarray
    right_hand_ind: jnp.ndarray
    left_hand_center: jnp.ndarray    # (3,)
    right_hand_center: jnp.ndarray
    n_shape: int
    n_exp: int

    @staticmethod
    def build(
        smplx_data: ParametricModelData,
        flame_data: ParametricModelData,
        extras: SmplxExtras,
    ) -> "EhmModel":
        smplx = smplx_data.jax()
        flame = flame_data.jax()
        # graft the FLAME head template into the SMPL-X template once,
        # anchored at the mean eye joints (ref: EHM.py:24-28)
        body_j = lbs_core.vertices2joints(
            jnp.asarray(smplx_data.J_regressor), smplx["v_template"][None]
        )[0]
        flame_j = lbs_core.vertices2joints(
            jnp.asarray(flame_data.J_regressor), flame["v_template"][None]
        )[0]
        anchor = body_j[J_LEYE : J_REYE + 1].mean(0) - flame_j[F_LEYE : F_REYE + 1].mean(0)
        v_t = smplx["v_template"].at[jnp.asarray(extras.smplx2flame_ind)].set(
            flame["v_template"] + anchor
        )
        smplx = dict(smplx, v_template=v_t)
        return EhmModel(
            smplx=smplx,
            flame=flame,
            smplx_parents=tuple(int(p) for p in smplx_data.parents),
            flame_parents=tuple(int(p) for p in flame_data.parents),
            smplx2flame_ind=jnp.asarray(extras.smplx2flame_ind, jnp.int32),
            left_hand_ind=jnp.asarray(extras.left_hand_ind, jnp.int32),
            right_hand_ind=jnp.asarray(extras.right_hand_ind, jnp.int32),
            left_hand_center=jnp.asarray(extras.left_hand_center, jnp.float32),
            right_hand_center=jnp.asarray(extras.right_hand_center, jnp.float32),
            n_shape=smplx_data.n_shape,
            n_exp=smplx_data.n_exp,
        )


def _pad_shape(shape: jnp.ndarray, n: int) -> jnp.ndarray:
    if shape.shape[-1] < n:
        pad = jnp.zeros(shape.shape[:-1] + (n - shape.shape[-1],), shape.dtype)
        return jnp.concatenate([shape, pad], axis=-1)
    return shape[..., :n]


def _as_rotmats(pose: jnp.ndarray) -> jnp.ndarray:
    """(B, n, 3) axis-angle or (B, n, 3, 3) rotmats -> rotmats."""
    if pose.ndim == 4:
        return pose
    return axis_angle_to_matrix(pose)


def _maybe_pose(pose, B, n, dtype=jnp.float32):
    if pose is None:
        return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, n, 3, 3))
    return _as_rotmats(pose)


def flame_branch(model: EhmModel, fp: FlameParams, B: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FLAME head LBS with global+neck zeroed (ref: EHM.py:59-75).

    Returns (head_vertices (B, Vf, 3), head_joints (B, 5, 3) posed)."""
    flame = model.flame
    betas = jnp.concatenate(
        [_pad_shape(fp.shape, model.n_shape), fp.exp], axis=-1
    )
    eyes = fp.eyes if fp.eyes is not None else jnp.zeros((B, 6))
    pose_aa = jnp.concatenate(
        [
            jnp.zeros((B, 6)),  # global + neck zeroed
            fp.jaw.reshape(B, 3),
            eyes.reshape(B, 6),
        ],
        axis=-1,
    ).reshape(B, 5, 3)
    res = lbs_core.lbs(
        pose_aa,
        flame["v_template"],
        None,
        model.flame_parents,
        flame["lbs_weights"],
        betas=betas,
        shapedirs=flame["shapedirs"],
        posedirs=flame["posedirs"],
        J_regressor=flame["J_regressor"],
    )
    verts = res.vertices
    if fp.eyelids is not None and "l_eyelid" in flame:
        verts = verts + flame["r_eyelid"][None] * fp.eyelids[:, 1, None, None]
        verts = verts + flame["l_eyelid"][None] * fp.eyelids[:, 0, None, None]
    return verts, res.joints_posed


def ehm_forward(
    model: EhmModel,
    body: BodyParams,
    flame: FlameParams | None = None,
) -> EhmResult:
    """Full EHM deformation (ref: EHM.py:36-156)."""
    smplx = model.smplx
    B = body.shape.shape[0]

    # ---- FLAME head ----
    head_verts = None
    if flame is not None:
        head_verts, head_joints = flame_branch(model, flame, B)
        if body.head_scale is not None:
            head_verts = head_verts * body.head_scale[:, None]

    # ---- SMPL-X body ----
    exp = body.exp if body.exp is not None else jnp.zeros((B, model.n_exp))
    shape_components = jnp.concatenate(
        [_pad_shape(body.shape, model.n_shape), exp], axis=-1
    )
    glob = _maybe_pose(body.global_pose, B, 1)
    body_p = _as_rotmats(body.body_pose)
    lhand = _maybe_pose(body.left_hand_pose, B, 15)
    rhand = _maybe_pose(body.right_hand_pose, B, 15)
    eye_jaw = jnp.broadcast_to(jnp.eye(3), (B, 3, 3, 3))  # jaw + 2 eyes zeroed (ref: EHM.py:98-99)
    full_pose = jnp.concatenate(
        [glob, body_p, eye_jaw, lhand, rhand], axis=1
    )  # (B, 55, 3, 3)

    template = smplx["v_template"][None] + lbs_core.blend_shapes(
        shape_components, smplx["shapedirs"]
    )
    if body.static_offset is not None:
        template = template + body.static_offset
    tbody_joints = lbs_core.vertices2joints(smplx["J_regressor"], template)
    if body.joints_offset is not None:
        tbody_joints = tbody_joints + body.joints_offset

    # ---- graft posed FLAME head into the shaped template ----
    if head_verts is not None:
        anchor = tbody_joints[:, J_LEYE : J_REYE + 1].mean(1, keepdims=True) - head_joints[
            :, F_LEYE : F_REYE + 1
        ].mean(1, keepdims=True)
        template = template.at[:, model.smplx2flame_ind].set(head_verts + anchor)

    # ---- hand scale about template hand centroids ----
    if body.hand_scale is not None:
        hs = body.hand_scale[:, None]
        for ind, center in (
            (model.left_hand_ind, model.left_hand_center),
            (model.right_hand_ind, model.right_hand_center),
        ):
            hv = template[:, ind] * hs + (1.0 - hs) * center[None, None]
            template = template.at[:, ind].set(hv)

    # ---- LBS on the fused template (rest joints re-regressed from it,
    #      ref lbs_wobeta: flame/lbs.py:293-295) ----
    joints_rest = lbs_core.vertices2joints(smplx["J_regressor"], template)
    if body.joints_offset is not None:
        joints_rest = joints_rest + body.joints_offset
    res = lbs_core.lbs(
        full_pose,
        template,
        joints_rest,
        model.smplx_parents,
        smplx["lbs_weights"],
        posedirs=smplx["posedirs"],
        pose2rot=False,
    )
    return EhmResult(
        vertices=res.vertices,
        joints_rest=joints_rest,
        joints_posed=res.joints_posed,
        vertex_transforms=res.vertex_transforms,
        joint_transforms=res.joint_transforms,
        template=template,
    )


def head_hand_subsets(model: EhmModel, result: EhmResult) -> dict[str, jnp.ndarray]:
    """Reference-parity auxiliary outputs (ref: EHM.py:139-154)."""
    return {
        "head_vertices": result.vertices[:, model.smplx2flame_ind],
        "head_ref_joint": result.joints_rest[:, J_LEYE : J_REYE + 1].mean(1, keepdims=True),
        "left_hand_vertices": result.vertices[:, model.left_hand_ind],
        "left_hand_ref_joint": result.joints_rest[:, J_LWRIST : J_LWRIST + 1],
        "right_hand_vertices": result.vertices[:, model.right_hand_ind],
        "right_hand_ref_joint": result.joints_rest[:, J_RWRIST : J_RWRIST + 1],
    }


def ehm_transform_mats(
    model: EhmModel,
    body: BodyParams,
    jaw: jnp.ndarray | None = None,
    eyes: jnp.ndarray | None = None,
    mirror_left_hand: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-joint transforms for external motion retargeting.

    Parity with EHM.get_transform_mat (ref: EHM.py:158-209): assemble the
    55-joint pose from body + hand + flame jaw/eye channels and return
    (joint_transforms (B, 55, 4, 4), joints_posed (B, 55, 3)).
    `mirror_left_hand` reproduces the reference's left-hand axis-angle
    mirror fix (EHM.py:176-180) for motion sources with mirrored left hands.
    """
    B = body.shape.shape[0]
    lhand = body.left_hand_pose
    if lhand is not None and mirror_left_hand and lhand.ndim == 3:
        lhand = lhand * jnp.asarray([1.0, -1.0, -1.0])
    glob = _maybe_pose(body.global_pose, B, 1)
    body_p = _as_rotmats(body.body_pose)
    jaw_m = _as_rotmats(jaw.reshape(B, 1, 3)) if jaw is not None else _maybe_pose(None, B, 1)
    eyes_m = _as_rotmats(eyes.reshape(B, 2, 3)) if eyes is not None else _maybe_pose(None, B, 2)
    lhand_m = _maybe_pose(lhand, B, 15)
    rhand_m = _maybe_pose(body.right_hand_pose, B, 15)
    full_pose = jnp.concatenate([glob, body_p, jaw_m, eyes_m, lhand_m, rhand_m], axis=1)

    smplx = model.smplx
    exp = body.exp if body.exp is not None else jnp.zeros((B, model.n_exp))
    shape_components = jnp.concatenate([_pad_shape(body.shape, model.n_shape), exp], -1)
    template = smplx["v_template"][None] + lbs_core.blend_shapes(
        shape_components, smplx["shapedirs"]
    )
    joints = lbs_core.vertices2joints(smplx["J_regressor"], template)
    if body.joints_offset is not None:
        joints = joints + body.joints_offset
    posed, rel = lbs_core.rigid_transform_chain(full_pose, joints, model.smplx_parents)
    return rel, posed
