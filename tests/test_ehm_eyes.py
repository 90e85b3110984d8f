"""Eye-pose / eyelid channel-order golden tests (VERDICT r2 item 6).

Pins FlameParams.eyes / .eyelids channel semantics to the reference's
equations (ref: models/modules/ehm/EHM.py:60-75):

  full_pose = cat([global(3), neck(3), jaw(3), eye_pose_params(6)])
      -> eyes[:, 0:3] drives FLAME joint 3, eyes[:, 3:6] drives joint 4
  verts += r_eyelid * eyelid_params[:, 1:2]   (index 1 -> RIGHT eyelid)
  verts += l_eyelid * eyelid_params[:, 0:1]   (index 0 -> LEFT eyelid)
  verts *= head_scale                          (AFTER eyelids)

Joint identity: FLAME joints are [global, neck, jaw, left_eyeball,
right_eyeball]; the EHM graft aligns FLAME joints 3:5 with SMPL-X joints
23:25 whose published names are left_eye_smplx / right_eye_smplx
(ref: EHM.py:24-28, SMPLX.py:33) — so eyes = [left(0:3), right(3:6)] and
eyelids = [left, right]. A channel swap in flame_branch fails these tests.
"""

import os
import re

import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.bodymodel import synthetic_ehm
from guava_renderer_tpu.bodymodel.ehm import EhmModel, FlameParams, flame_branch

REF_EHM = "/root/reference/models/modules/ehm/EHM.py"


@pytest.fixture(scope="module")
def ehm():
    smplx, flame, extras = synthetic_ehm(
        body_side=15, head_side=9, uv_size=16, n_shape=6, n_exp=3)
    return EhmModel.build(smplx, flame, extras)


def _head(ehm, eyes=None, eyelids=None):
    fp = FlameParams(
        shape=jnp.zeros((1, 6)),
        exp=jnp.zeros((1, 3)),
        jaw=jnp.zeros((1, 3)),
        eyes=None if eyes is None else jnp.asarray(eyes, jnp.float32)[None],
        eyelids=None if eyelids is None else jnp.asarray(eyelids, jnp.float32)[None],
    )
    verts, _ = flame_branch(ehm, fp, 1)
    return np.asarray(verts[0])


@pytest.mark.skipif(not os.path.exists(REF_EHM), reason="reference absent")
def test_reference_source_equations():
    """The assumptions above must literally appear in the reference source."""
    src = open(REF_EHM).read()
    assert re.search(
        r"full_pose\s*=\s*torch\.cat\(\[global_pose_params,\s*neck_pose_params,"
        r"\s*jaw_params,\s*eye_pose_params\]", src), \
        "reference full_pose order changed — re-derive eye channel mapping"
    assert re.search(r"r_eyelid.*eyelid_params\[:,\s*1:2", src), \
        "reference r_eyelid no longer bound to eyelid channel 1"
    assert re.search(r"l_eyelid.*eyelid_params\[:,\s*0:1", src), \
        "reference l_eyelid no longer bound to eyelid channel 0"
    # head scale multiplies verts AFTER the eyelid offsets
    eyelid_pos = src.index("l_eyelid.expand")
    scale_pos = src.index("head_vertices*head_scale")
    assert scale_pos > eyelid_pos


def test_eye_channels_drive_their_joints(ehm):
    """eyes[0:3] moves only joint-3-bound verts; eyes[3:6] only joint 4.

    Uses a hardened copy of the rig (one-hot lbs weights, zero posedirs) so
    the only coupling left is the channel->joint binding under test —
    synthetic soft weights and random pose blendshapes otherwise smear every
    joint rotation over all vertices."""
    w_soft = np.asarray(ehm.flame["lbs_weights"])  # (V, 5)
    w_hard = np.zeros_like(w_soft)
    w_hard[np.arange(w_soft.shape[0]), w_soft.argmax(-1)] = 1.0
    flame = dict(ehm.flame)
    flame["lbs_weights"] = jnp.asarray(w_hard)
    flame["posedirs"] = jnp.zeros_like(ehm.flame["posedirs"])
    hard = ehm._replace(flame=flame)

    base = _head(hard, eyes=np.zeros(6))
    theta = np.array([0.0, 0.0, 0.6])
    d3 = np.abs(_head(hard, eyes=np.concatenate([theta, np.zeros(3)])) - base).max(-1)
    d4 = np.abs(_head(hard, eyes=np.concatenate([np.zeros(3), theta])) - base).max(-1)

    j3 = w_hard[:, 3] > 0.5
    j4 = w_hard[:, 4] > 0.5
    assert j3.any() and j4.any(), "synthetic rig lost its eye weights"
    assert d3[j3].max() > 1e-3, "eyes[:, :3] does not drive FLAME joint 3"
    assert d4[j4].max() > 1e-3, "eyes[:, 3:] does not drive FLAME joint 4"
    assert d3[j4].max() < 1e-7, \
        "eyes[:, :3] leaked into joint-4 vertices (channels swapped?)"
    assert d4[j3].max() < 1e-7, \
        "eyes[:, 3:] leaked into joint-3 vertices (channels swapped?)"


def test_eyelid_channel_binding(ehm):
    """eyelids[0] applies l_eyelid, eyelids[1] applies r_eyelid, exactly."""
    l_e = np.asarray(ehm.flame["l_eyelid"])
    r_e = np.asarray(ehm.flame["r_eyelid"])
    assert np.abs(l_e - r_e).max() > 0, "synthetic eyelids not asymmetric"

    base = _head(ehm, eyelids=np.zeros(2))
    a, b = 0.37, -0.21
    left_only = _head(ehm, eyelids=np.array([a, 0.0]))
    right_only = _head(ehm, eyelids=np.array([0.0, b]))
    np.testing.assert_allclose(left_only - base, a * l_e, atol=1e-6,
                               err_msg="eyelids[0] must bind to l_eyelid")
    np.testing.assert_allclose(right_only - base, b * r_e, atol=1e-6,
                               err_msg="eyelids[1] must bind to r_eyelid")


def test_flame_branch_matches_numpy_reference_equations(ehm):
    """Full asymmetric-eye replication of EHM.py:60-75 in numpy."""
    from test_lbs import numpy_lbs_reference

    flame = {k: np.asarray(v) for k, v in ehm.flame.items()
             if hasattr(v, "shape")}
    eyes = np.array([0.3, -0.2, 0.1, -0.4, 0.25, 0.05], np.float32)
    eyelids = np.array([0.5, -0.3], np.float32)
    jaw = np.array([0.1, 0.05, -0.08], np.float32)
    shape = np.linspace(-1, 1, 6).astype(np.float32)
    exp = np.array([0.5, -0.5, 0.25], np.float32)

    # reference equation order (EHM.py:60-75)
    betas = np.concatenate([shape, exp])[None]
    full_pose = np.concatenate([np.zeros(6, np.float32), jaw, eyes])[None]
    verts_np = numpy_lbs_reference(
        full_pose.reshape(1, 5, 3), flame["v_template"], betas,
        flame["shapedirs"], flame["posedirs"], flame["J_regressor"],
        np.asarray(ehm.flame_parents), flame["lbs_weights"],
    )[0][0]
    verts_np = verts_np + flame["r_eyelid"] * eyelids[1]
    verts_np = verts_np + flame["l_eyelid"] * eyelids[0]

    fp = FlameParams(
        shape=jnp.asarray(shape)[None], exp=jnp.asarray(exp)[None],
        jaw=jnp.asarray(jaw)[None], eyes=jnp.asarray(eyes)[None],
        eyelids=jnp.asarray(eyelids)[None],
    )
    ours, _ = flame_branch(ehm, fp, 1)
    np.testing.assert_allclose(np.asarray(ours[0]), verts_np, atol=2e-5,
                               rtol=1e-4)
