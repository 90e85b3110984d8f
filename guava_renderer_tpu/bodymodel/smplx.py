"""Standalone SMPL-X forward (outside the EHM hybrid).

Parity with the reference SMPLX.forward (ref: models/modules/smplx/
SMPLX.py:257-380): eyelid blendshapes + per-part head/hand scaling about the
template centroids applied to the template, then LBS with shape+expression
blendshapes; plus `pose_rel2abs` (ref :397-427) and landmark extraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import lbs as lbs_core
from ..core.rotations import axis_angle_to_matrix
from .data import ParametricModelData, SmplxExtras
from .ehm import BodyParams, FlameParams, _as_rotmats, _maybe_pose, _pad_shape


class SmplxResult(NamedTuple):
    vertices: jnp.ndarray
    joints_rest: jnp.ndarray
    joints_posed: jnp.ndarray
    joint_transforms: jnp.ndarray
    vertex_transforms: jnp.ndarray


def smplx_forward(
    data_jax: dict,
    parents,
    extras_jax: dict,
    body: BodyParams,
    eyelid_params: jnp.ndarray | None = None,
    n_shape: int = 300,
    n_exp: int = 50,
) -> SmplxResult:
    """data_jax = ParametricModelData.jax(); extras_jax holds index arrays
    {'smplx2flame_ind','left_hand_ind','right_hand_ind', centers...}."""
    B = body.shape.shape[0]
    exp = body.exp if body.exp is not None else jnp.zeros((B, n_exp))
    shape_components = jnp.concatenate([_pad_shape(body.shape, n_shape), exp], -1)

    glob = _maybe_pose(body.global_pose, B, 1)
    body_p = _as_rotmats(body.body_pose)
    jaw_eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3, 3))
    lhand = _maybe_pose(body.left_hand_pose, B, 15)
    rhand = _maybe_pose(body.right_hand_pose, B, 15)
    full_pose = jnp.concatenate([glob, body_p, jaw_eye, lhand, rhand], axis=1)

    template = jnp.broadcast_to(
        data_jax["v_template"], (B,) + data_jax["v_template"].shape
    )
    head_ind = extras_jax["smplx2flame_ind"]
    head_vert = template[:, head_ind]
    if eyelid_params is not None and "l_eyelid" in data_jax:
        head_vert = head_vert + data_jax["r_eyelid"][None, head_ind] * eyelid_params[:, 1, None, None]
        head_vert = head_vert + data_jax["l_eyelid"][None, head_ind] * eyelid_params[:, 0, None, None]
    if body.head_scale is not None:
        hs = body.head_scale[:, None]
        head_vert = head_vert * hs + (1 - hs) * extras_jax["head_center"][None, None]
    template = template.at[:, head_ind].set(head_vert)
    if body.hand_scale is not None:
        hs = body.hand_scale[:, None]
        for side in ("left", "right"):
            ind = extras_jax[f"{side}_hand_ind"]
            ctr = extras_jax[f"{side}_hand_center"]
            template = template.at[:, ind].set(
                template[:, ind] * hs + (1 - hs) * ctr[None, None]
            )

    template = template + lbs_core.blend_shapes(shape_components, data_jax["shapedirs"])
    if body.static_offset is not None:
        template = template + body.static_offset
    joints = lbs_core.vertices2joints(data_jax["J_regressor"], template)
    if body.joints_offset is not None:
        joints = joints + body.joints_offset

    res = lbs_core.lbs(
        full_pose, template, joints, parents, data_jax["lbs_weights"],
        posedirs=data_jax["posedirs"], pose2rot=False,
    )
    return SmplxResult(
        vertices=res.vertices,
        joints_rest=joints,
        joints_posed=res.joints_posed,
        joint_transforms=res.joint_transforms,
        vertex_transforms=res.vertex_transforms,
    )


# kinematic chains for absolute pose queries (ref: SMPLX.py:403-420)
_ABS_CHAINS = {
    "head": (15, 12, 9, 6, 3, 0),
    "neck": (12, 9, 6, 3, 0),
    "right_wrist": (21, 19, 17, 14, 9, 6, 3, 0),
    "left_wrist": (20, 18, 16, 13, 9, 6, 3, 0),
}


def pose_rel2abs(global_pose: jnp.ndarray, body_pose: jnp.ndarray, abs_joint: str = "head"):
    """Relative -> absolute rotation along the kinematic chain."""
    full = jnp.concatenate([_as_rotmats(global_pose), _as_rotmats(body_pose)], axis=1)
    chain = _ABS_CHAINS[abs_joint]
    B = full.shape[0]
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    for idx in chain:
        R = jnp.matmul(full[:, idx], R)
    return R[:, None]


def flame_forward(
    data_jax: dict,
    parents,
    flame: FlameParams,
    neck_pose: jnp.ndarray | None = None,
    global_pose: jnp.ndarray | None = None,
    n_shape: int = 300,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Standalone FLAME LBS (ref: models/modules/flame/FLAME.py:260-339).

    Returns (vertices (B, V, 3), joints_posed (B, 5, 3))."""
    B = flame.shape.shape[0]
    betas = jnp.concatenate([_pad_shape(flame.shape, n_shape), flame.exp], -1)
    glob = global_pose if global_pose is not None else jnp.zeros((B, 3))
    neck = neck_pose if neck_pose is not None else jnp.zeros((B, 3))
    eyes = flame.eyes if flame.eyes is not None else jnp.zeros((B, 6))
    pose = jnp.concatenate(
        [glob.reshape(B, 3), neck.reshape(B, 3), flame.jaw.reshape(B, 3), eyes.reshape(B, 6)],
        axis=-1,
    ).reshape(B, 5, 3)
    res = lbs_core.lbs(
        pose, data_jax["v_template"], None, parents, data_jax["lbs_weights"],
        betas=betas, shapedirs=data_jax["shapedirs"], posedirs=data_jax["posedirs"],
        J_regressor=data_jax["J_regressor"],
    )
    verts = res.vertices
    if flame.eyelids is not None and "l_eyelid" in data_jax:
        verts = verts + data_jax["r_eyelid"][None] * flame.eyelids[:, 1, None, None]
        verts = verts + data_jax["l_eyelid"][None] * flame.eyelids[:, 0, None, None]
    return verts, res.joints_posed


def extras_to_jax(extras: SmplxExtras) -> dict:
    import jax.numpy as jnp

    return {
        "smplx2flame_ind": jnp.asarray(extras.smplx2flame_ind),
        "left_hand_ind": jnp.asarray(extras.left_hand_ind),
        "right_hand_ind": jnp.asarray(extras.right_hand_ind),
        "head_center": jnp.asarray(extras.head_center),
        "left_hand_center": jnp.asarray(extras.left_hand_center),
        "right_hand_center": jnp.asarray(extras.right_hand_center),
    }
