"""End-to-end avatar slice on synthetic assets: infer -> deform -> render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.avatar.deformer import canonical_gaussians, deform_avatar
from guava_renderer_tpu.avatar.inferer import (
    InfererConfig,
    UbodyGaussianInferer,
    build_avatar,
)
from guava_renderer_tpu.avatar.renderer import GaussianRenderer
from guava_renderer_tpu.avatar.state import num_gaussians, prune_avatar
from guava_renderer_tpu.bodymodel import synthetic_ehm
from guava_renderer_tpu.bodymodel.ehm import BodyParams, EhmModel, FlameParams
from guava_renderer_tpu.core.cameras import Camera
from guava_renderer_tpu.ops.gsplat import RasterizeSettings

IMG = 64          # render size
FEAT = 70         # encoder input (5x5 patches of 14)
UV = 32
INVTANFOV = 3.0


@pytest.fixture(scope="module")
def setup():
    smplx, flame_m, extras = synthetic_ehm(uv_size=UV)
    ehm = EhmModel.build(smplx, flame_m, extras)
    cfg = InfererConfig(
        image_size=IMG,
        uvmap_size=UV,
        invtanfov=INVTANFOV,
        dino_out_dim=8,
        uv_out_dim=16,
        smplx_fea_dim=16,
        prj_out_dim=16,
        global_vertex_dim=32,
        uv_base_dim=8,
        style_dim=64,
        num_mlp=2,
        channel_scale=8.0,
    )
    inferer = UbodyGaussianInferer(cfg=cfg, num_vertices=smplx.num_vertices)
    B = 1
    image = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, FEAT, FEAT, 3)), jnp.float32)
    # camera in front of the rig looking +z (rig around origin..y up)
    w2c = jnp.eye(4)[None]
    w2c = w2c.at[:, 2, 3].set(6.0)  # push scene forward

    body = BodyParams(
        shape=jnp.zeros((B, smplx.n_shape)),
        body_pose=jnp.zeros((B, 21, 3)),
    )
    flame_p = FlameParams(
        shape=jnp.zeros((B, smplx.n_shape)),
        exp=jnp.zeros((B, smplx.n_exp)),
        jaw=jnp.zeros((B, 3)),
    )

    faces = jnp.asarray(smplx.faces)
    fidx = jnp.asarray(extras.uvmap_f_idx)
    fbary = jnp.asarray(extras.uvmap_f_bary)
    fmask = jnp.asarray(extras.uvmap_mask)

    params = inferer.init(
        jax.random.PRNGKey(0),
        image, w2c,
        jnp.zeros((B, smplx.num_vertices, 3)),
        jnp.zeros((B, UV, UV)),
        fidx, fbary, faces,
    )
    return dict(
        smplx=smplx, extras=extras, ehm=ehm, cfg=cfg, inferer=inferer,
        params=params, image=image, w2c=w2c, body=body, flame=flame_p,
        faces=faces, fidx=fidx, fbary=fbary, fmask=fmask,
    )


def test_build_avatar_shapes(setup):
    s = setup
    avatar, extra = build_avatar(
        s["inferer"], s["params"], s["ehm"], s["faces"], s["fidx"], s["fbary"],
        s["fmask"], s["image"], s["w2c"], s["body"], s["flame"],
        image_size=IMG, invtanfov=INVTANFOV,
    )
    V = s["smplx"].num_vertices
    assert avatar.vtx_positions.shape == (1, V, 3)
    assert avatar.vtx_colors.shape == (1, V, 32)
    assert avatar.uv_local_xyz.shape == (1, UV * UV, 3)
    assert np.isfinite(np.asarray(avatar.uv_scales)).all()
    assert extra["uvmap_texture"].shape == (1, UV, UV, 3)
    # RGB channels are in [0, 1] after sigmoid
    assert float(avatar.vtx_colors[..., :3].min()) >= 0.0
    assert float(avatar.vtx_colors[..., :3].max()) <= 1.0


def test_deform_and_render(setup):
    s = setup
    avatar, _ = build_avatar(
        s["inferer"], s["params"], s["ehm"], s["faces"], s["fidx"], s["fbary"],
        s["fmask"], s["image"], s["w2c"], s["body"], s["flame"],
        image_size=IMG, invtanfov=INVTANFOV,
    )
    gs = deform_avatar(avatar, s["ehm"], s["faces"], s["body"], s["flame"])
    P = num_gaussians(avatar)
    assert gs.xyz.shape == (1, P, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(gs.rotation), axis=-1), 1.0, atol=1e-3
    )

    cam = Camera(
        R=s["w2c"][0, :3, :3], t=s["w2c"][0, :3, 3],
        tanfovx=jnp.asarray(1.0 / INVTANFOV), tanfovy=jnp.asarray(1.0 / INVTANFOV),
        width=IMG, height=IMG,
    )
    renderer = GaussianRenderer(
        image_size=IMG, channel_scale=8.0,
        settings=RasterizeSettings(chunk=8, max_tiles_per_gaussian=8),
    )
    rparams = renderer.init(jax.random.PRNGKey(1), gs, [cam])
    out = renderer.apply(rparams, gs, [cam])
    assert out.renders.shape == (1, IMG, IMG, 3)
    assert out.raw_renders.shape == (1, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out.renders)).all()
    # something must have been rasterized
    assert float(jnp.abs(out.feature_renders).max()) > 0.0


def test_canonical_and_prune(setup):
    s = setup
    avatar, _ = build_avatar(
        s["inferer"], s["params"], s["ehm"], s["faces"], s["fidx"], s["fbary"],
        s["fmask"], s["image"], s["w2c"], s["body"], s["flame"],
        image_size=IMG, invtanfov=INVTANFOV,
    )
    gs = canonical_gaussians(avatar, s["faces"])
    assert np.isfinite(np.asarray(gs.xyz)).all()
    pruned = prune_avatar(avatar, opacity_threshold=0.5)
    assert pruned.uv_local_xyz.shape[1] <= avatar.uv_local_xyz.shape[1]


def test_gradients_flow_to_inferer(setup):
    s = setup

    def loss(params):
        avatar, _ = build_avatar(
            s["inferer"], params, s["ehm"], s["faces"], s["fidx"], s["fbary"],
            s["fmask"], s["image"], s["w2c"], s["body"], s["flame"],
            image_size=IMG, invtanfov=INVTANFOV,
        )
        gs = deform_avatar(avatar, s["ehm"], s["faces"], s["body"], s["flame"])
        from guava_renderer_tpu.ops.gsplat import rasterize

        cam = Camera(
            R=s["w2c"][0, :3, :3], t=s["w2c"][0, :3, 3],
            tanfovx=jnp.asarray(1.0 / INVTANFOV), tanfovy=jnp.asarray(1.0 / INVTANFOV),
            width=IMG, height=IMG,
        )
        color, _, _ = rasterize(
            gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0], gs.rotation[0],
            cam, jnp.zeros(32), RasterizeSettings(chunk=8, max_tiles_per_gaussian=8),
        )
        return jnp.mean((color - 0.5) ** 2)

    g = jax.grad(loss)(s["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0.0


def test_deform_component_form_matches_stacked_spec():
    """deform_with_vertices runs flat (B, N) component math for the UV
    chart (stacked small-trailing-dim tensors lane-pad ~40x on TPU); this
    pins it to the original stacked formulation."""
    import numpy as np

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices
    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.core.mesh import face_orientation
    from guava_renderer_tpu.core.rotations import (
        matrix_to_quat, quat_multiply, quat_normalize,
    )

    from guava_renderer_tpu.bodymodel.synthetic import _grid_mesh

    rng = np.random.default_rng(11)
    gverts, gfaces = _grid_mesh(7, 7)            # well-formed triangles
    V, F = gverts.shape[0], gfaces.shape[0]
    N, B = 64, 2
    verts = jnp.asarray(
        gverts[None] + rng.normal(0, 0.03, (B, V, 3)), jnp.float32
    )
    faces = jnp.asarray(gfaces, jnp.int32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    aa = rng.normal(0, 0.3, (B, V, 3)).astype(np.float32)
    # random small rotations in the transforms
    for b in range(B):
        for v in range(V):
            th = np.linalg.norm(aa[b, v]) + 1e-9
            k = aa[b, v] / th
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            T[b, v, :3, :3] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    T = jnp.asarray(T)

    def mk(shape):
        return jnp.asarray(rng.normal(0, 1, shape), jnp.float32)

    quats = rng.normal(size=(B, N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    vq = rng.normal(size=(B, V, 4)).astype(np.float32)
    vq /= np.linalg.norm(vq, axis=-1, keepdims=True)
    bary = rng.dirichlet([1, 1, 1], N).astype(np.float32)
    avatar = GaussianAvatar(
        vtx_positions=verts,
        vtx_colors=mk((B, V, 32)),
        vtx_opacity=mk((B, V, 1)),
        vtx_scales=mk((B, V, 3)),
        vtx_rotations=jnp.asarray(vq),
        uv_local_xyz=mk((B, N, 3)),
        uv_colors=mk((B, N, 32)),
        uv_opacity=mk((B, N, 1)),
        uv_scales=mk((B, N, 3)),
        uv_rotations=jnp.asarray(quats),
        uv_binding_face=jnp.asarray(rng.integers(0, F, N), jnp.int32),
        uv_face_bary=jnp.asarray(bary),
        uv_valid=jnp.ones((N,), jnp.float32),
    )

    out = deform_with_vertices(avatar, verts, T, faces)

    # stacked-form spec (the original implementation)
    R_face, face_scale = face_orientation(verts, faces, return_scale=True)
    face_quat = matrix_to_quat(R_face)
    bind = avatar.uv_binding_face
    tri = faces[bind]
    tri_pts = verts[:, tri]
    centers = jnp.einsum("nk,bnkj->bnj", avatar.uv_face_bary, tri_pts)
    R_nn = R_face[:, bind]
    s_nn = face_scale[:, bind]
    uv_xyz = jnp.einsum("bnij,bnj->bni", R_nn, avatar.uv_local_xyz) * s_nn + centers
    uv_rot = quat_multiply(face_quat[:, bind], avatar.uv_rotations)
    uv_scale = avatar.uv_scales * s_nn
    d_rot = matrix_to_quat(T[:, :, :3, :3])
    vtx_rot = quat_normalize(quat_multiply(d_rot, avatar.vtx_rotations))

    np.testing.assert_allclose(out.xyz[:, V:], uv_xyz, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.rotation[:, V:], uv_rot, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.scaling[:, V:], uv_scale, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.rotation[:, :V], vtx_rot, rtol=1e-5, atol=1e-5)
