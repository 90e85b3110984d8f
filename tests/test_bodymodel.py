"""EHM / teeth / UV-table tests on synthetic assets."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.bodymodel import synthetic_ehm
from guava_renderer_tpu.bodymodel.data import uv_face_tables
from guava_renderer_tpu.bodymodel.ehm import (
    BodyParams,
    EhmModel,
    FlameParams,
    ehm_forward,
    head_hand_subsets,
)


@pytest.fixture(scope="module")
def ehm_assets():
    return synthetic_ehm()


@pytest.fixture(scope="module")
def model(ehm_assets):
    smplx, flame, extras = ehm_assets
    return EhmModel.build(smplx, flame, extras)


def _neutral_params(model, B=2):
    body = BodyParams(
        shape=jnp.zeros((B, model.n_shape)),
        body_pose=jnp.zeros((B, 21, 3)),
    )
    flame = FlameParams(
        shape=jnp.zeros((B, model.n_shape)),
        exp=jnp.zeros((B, model.n_exp)),
        jaw=jnp.zeros((B, 3)),
    )
    return body, flame


def test_teeth_grafting_counts(ehm_assets):
    smplx, flame, extras = ehm_assets
    # 8 rows of 8 teeth verts appended to both models
    assert smplx.num_vertices == 24 * 24 + 10 * 10 + 64
    assert flame.num_vertices == 10 * 10 + 64
    assert extras.smplx2flame_ind.shape[0] == flame.num_vertices
    # strips: 3 per jaw, 2*(N-1) faces each, both jaws
    n_teeth_faces = 2 * 3 * 2 * 7
    assert smplx.faces.shape[0] == 2 * 23 * 23 + 2 * 9 * 9 + n_teeth_faces
    # teeth follow neck/jaw joints exclusively
    teeth_w = smplx.lbs_weights[-64:]
    assert set(np.nonzero(teeth_w)[1]) <= {12, 22}


def test_neutral_graft_is_near_identity(model):
    """Head region regressors mirror flame's, so neutral grafting must not move
    the fused template away from the init-grafted v_template."""
    body, flame = _neutral_params(model)
    res = ehm_forward(model, body, flame)
    v_t = np.asarray(model.smplx["v_template"])
    np.testing.assert_allclose(res.template[0], v_t, atol=1e-4)
    np.testing.assert_allclose(res.vertices[0], v_t, atol=1e-4)


def test_jaw_moves_only_jaw_bound_vertices(model):
    body, flame = _neutral_params(model, B=1)
    flame_jaw = flame._replace(jaw=jnp.asarray([[0.4, 0.0, 0.0]]))
    r0 = ehm_forward(model, body, flame)
    r1 = ehm_forward(model, body, flame_jaw)
    delta = np.abs(np.asarray(r1.vertices - r0.vertices)).sum(-1)[0]
    moved = np.nonzero(delta > 1e-6)[0]
    assert moved.size > 0
    # only head-region vertices may move (graft carries the jaw motion)
    head_ids = set(np.asarray(model.smplx2flame_ind).tolist())
    assert set(moved.tolist()) <= head_ids


def test_head_scale_scales_head(model):
    body, flame = _neutral_params(model, B=1)
    body_s = body._replace(head_scale=jnp.full((1, 3), 1.5))
    r0 = ehm_forward(model, body, flame)
    r1 = ehm_forward(model, body_s, flame)
    head = np.asarray(model.smplx2flame_ind)
    # head extent grows ~1.5x around its anchor
    e0 = np.asarray(r0.vertices)[0, head].std(0)
    e1 = np.asarray(r1.vertices)[0, head].std(0)
    np.testing.assert_allclose(e1 / e0, 1.5, rtol=0.05)


def test_vertex_transforms_consistent(model):
    """vertices == vertex_transforms applied to the fused template."""
    rng = np.random.default_rng(3)
    B = 2
    body = BodyParams(
        shape=jnp.asarray(rng.normal(size=(B, model.n_shape)) * 0.5, jnp.float32),
        body_pose=jnp.asarray(rng.normal(size=(B, 21, 3)) * 0.2, jnp.float32),
        joints_offset=jnp.asarray(rng.normal(size=(B, 55, 3)) * 0.01, jnp.float32),
    )
    flame = FlameParams(
        shape=jnp.zeros((B, model.n_shape)),
        exp=jnp.asarray(rng.normal(size=(B, model.n_exp)) * 0.3, jnp.float32),
        jaw=jnp.asarray(rng.normal(size=(B, 3)) * 0.1, jnp.float32),
        eyelids=jnp.asarray(rng.normal(size=(B, 2)) * 0.5, jnp.float32),
    )
    res = ehm_forward(model, body, flame)
    T = np.asarray(res.vertex_transforms)
    tmpl = np.asarray(res.template)
    # NOTE: LBS applies pose-corrective offsets before T; posedirs are tiny in
    # the synthetic rig so tolerance covers them.
    recon = np.einsum("bvij,bvj->bvi", T[:, :, :3, :3], tmpl) + T[:, :, :3, 3]
    np.testing.assert_allclose(recon, np.asarray(res.vertices), atol=5e-3)


def test_rotmat_and_axis_angle_pose_agree(model):
    from guava_renderer_tpu.core.rotations import axis_angle_to_matrix

    rng = np.random.default_rng(4)
    B = 1
    aa = jnp.asarray(rng.normal(size=(B, 21, 3)) * 0.3, jnp.float32)
    body_aa = BodyParams(shape=jnp.zeros((B, model.n_shape)), body_pose=aa)
    body_mat = body_aa._replace(body_pose=axis_angle_to_matrix(aa))
    flame = FlameParams(
        shape=jnp.zeros((B, model.n_shape)),
        exp=jnp.zeros((B, model.n_exp)),
        jaw=jnp.zeros((B, 3)),
    )
    r_aa = ehm_forward(model, body_aa, flame)
    r_mat = ehm_forward(model, body_mat, flame)
    np.testing.assert_allclose(r_aa.vertices, r_mat.vertices, atol=1e-5)


def test_ehm_jits_and_differentiates(model):
    body, flame = _neutral_params(model, B=1)

    @jax.jit
    def f(jaw):
        res = ehm_forward(model, body, flame._replace(jaw=jaw))
        return jnp.sum(res.vertices ** 2)

    g = jax.grad(f)(jnp.asarray([[0.2, 0.1, 0.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_subsets(model):
    body, flame = _neutral_params(model, B=1)
    res = ehm_forward(model, body, flame)
    subs = head_hand_subsets(model, res)
    assert subs["head_vertices"].shape[1] == model.smplx2flame_ind.shape[0]
    assert subs["left_hand_vertices"].shape[1] == model.left_hand_ind.shape[0]


def test_uv_face_tables_coverage(ehm_assets):
    smplx, flame, extras = ehm_assets
    fidx, fbary, fmask = (
        extras.uvmap_f_idx,
        extras.uvmap_f_bary,
        extras.uvmap_mask,
    )
    assert fmask.sum() > 0.2 * fmask.size  # chart covers a decent area
    valid = fidx[fmask]
    assert valid.min() >= 0 and valid.max() < smplx.faces.shape[0]
    # barycentrics sum to 1 where valid
    s = fbary[fmask].sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-4)
    # reconstruct texel UVs from barycoords: must land on the texel (inverse check)
    U = fidx.shape[0]
    yy, xx = np.nonzero(fmask)
    take = slice(0, len(yy), max(1, len(yy) // 200))
    yy, xx = yy[take], xx[take]
    # edge texels painted by the polygon outline may sit slightly outside
    # their triangle (abs-area barycentrics clamp there) — tolerate ~1.5 texel
    tri_uv = np.round(extras.texcoords[extras.faces_uv_idx[fidx[yy, xx]]] * U)
    recon = np.einsum("nkc,nk->nc", tri_uv, fbary[yy, xx])
    np.testing.assert_allclose(recon[:, 0], xx, atol=1.5)
    np.testing.assert_allclose(recon[:, 1], yy, atol=1.5)
