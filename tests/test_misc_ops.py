"""kNN op, standalone SMPLX/FLAME forwards, motion utilities."""

import jax.numpy as jnp
import numpy as np

from guava_renderer_tpu.bodymodel import synthetic_ehm
from guava_renderer_tpu.bodymodel.ehm import BodyParams, FlameParams
from guava_renderer_tpu.bodymodel.smplx import (
    extras_to_jax,
    flame_forward,
    pose_rel2abs,
    smplx_forward,
)
from guava_renderer_tpu.motion import motion_frame_params, resample_motion
from guava_renderer_tpu.ops.knn import knn_mean_sq_dist, knn_mean_sq_dist_exact


def test_knn_exact_matches_bruteforce(rng):
    pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    out = knn_mean_sq_dist_exact(pts, k=3)
    d2 = ((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_knn_morton_close_to_exact(rng):
    # clustered points so morton windows capture true neighbors
    pts = rng.normal(size=(4096, 3)).astype(np.float32) * 0.1
    approx = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, window=32))
    exact = np.asarray(knn_mean_sq_dist_exact(jnp.asarray(pts), k=3))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    assert np.median(rel) < 0.05


def test_smplx_forward_neutral(rng):
    smplx, flame, extras = synthetic_ehm(uv_size=16, add_teeth=False)
    data = smplx.jax()
    ej = extras_to_jax(extras)
    B = 2
    body = BodyParams(
        shape=jnp.zeros((B, smplx.n_shape)), body_pose=jnp.zeros((B, 21, 3))
    )
    res = smplx_forward(data, tuple(smplx.parents), ej, body,
                        n_shape=smplx.n_shape, n_exp=smplx.n_exp)
    np.testing.assert_allclose(
        res.vertices[0], smplx.v_template, atol=1e-5
    )
    # head scale shrinks the head about its centroid
    body2 = body._replace(head_scale=jnp.full((B, 3), 0.5))
    res2 = smplx_forward(data, tuple(smplx.parents), ej, body2,
                         n_shape=smplx.n_shape, n_exp=smplx.n_exp)
    head = np.asarray(ej["smplx2flame_ind"])
    e1 = np.asarray(res.vertices)[0, head].std(0)[:2]  # z is flat in the grid rig
    e2 = np.asarray(res2.vertices)[0, head].std(0)[:2]
    np.testing.assert_allclose(e2 / e1, 0.5, rtol=0.05)


def test_flame_forward_jaw(rng):
    smplx, flame, extras = synthetic_ehm(uv_size=16, add_teeth=False)
    data = flame.jax()
    B = 1
    fp = FlameParams(
        shape=jnp.zeros((B, flame.n_shape)),
        exp=jnp.zeros((B, flame.n_exp)),
        jaw=jnp.asarray([[0.3, 0.0, 0.0]]),
    )
    v, j = flame_forward(data, tuple(flame.parents), fp, n_shape=flame.n_shape)
    fp0 = fp._replace(jaw=jnp.zeros((B, 3)))
    v0, _ = flame_forward(data, tuple(flame.parents), fp0, n_shape=flame.n_shape)
    assert float(jnp.abs(v - v0).max()) > 1e-4


def test_pose_rel2abs_identity_chain():
    B = 2
    glob = jnp.zeros((B, 1, 3))
    body = jnp.zeros((B, 21, 3))
    R = pose_rel2abs(glob, body, "head")
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (B, 1, 3, 3)), atol=1e-6)


def test_motion_resample_and_params(rng):
    T = 30
    motion = {
        "body_pose": rng.normal(size=(T, 21, 3)).astype(np.float32),
        "jaw": rng.normal(size=(T, 3)).astype(np.float32),
        "eyes": np.zeros((T, 6), np.float32),
        "left_hand_pose": np.zeros((T, 15, 3), np.float32),
        "right_hand_pose": np.zeros((T, 15, 3), np.float32),
    }
    res = resample_motion(motion, 25.0, 30.0)
    assert res["body_pose"].shape[0] == int((T - 1) / 25 * 30) + 1
    # endpoints preserved
    np.testing.assert_allclose(res["body_pose"][0], motion["body_pose"][0], atol=1e-6)

    p = motion_frame_params(motion, None, 5, n_shape=10, n_exp=5,
                            identity={"shape": np.ones(10, np.float32)})
    assert p["body_pose"].shape == (1, 21, 3)
    assert p["shape"].shape == (1, 10)
    np.testing.assert_allclose(p["shape"], 1.0)


def test_flame_mask_regions():
    from guava_renderer_tpu.bodymodel.flame_mask import FlameMask

    faces = np.asarray([[1713, 1715, 0], [5, 6, 7], [1713, 1576, 1715]])
    fm = FlameMask(faces=faces)
    up = fm.get_vid_by_region(["lip_outside_ring_upper"], keep_order=True)
    assert up.shape == (15,) and up[0] == 1713
    both = fm.get_vid_by_region(
        ["lip_outside_ring_upper", "lip_outside_ring_lower"], keep_order=False
    )
    assert both.shape == (30,)
    fids = fm.get_fid_by_region(["lip_outside_ring_upper"], all_vertices=False)
    assert set(fids.tolist()) == {0, 2}
    fids_all = fm.get_fid_by_region(
        ["lip_outside_ring_upper", "lip_outside_ring_lower"], all_vertices=True
    )
    assert set(fids_all.tolist()) == {2}


def test_ehm_transform_mats():
    import jax.numpy as jnp

    from guava_renderer_tpu.bodymodel.ehm import BodyParams, EhmModel, ehm_transform_mats

    smplx, flame, extras = synthetic_ehm(uv_size=16, add_teeth=False)
    model = EhmModel.build(smplx, flame, extras)
    B = 1
    body = BodyParams(
        shape=jnp.zeros((B, smplx.n_shape)),
        body_pose=jnp.zeros((B, 21, 3)),
        left_hand_pose=jnp.asarray(np.random.default_rng(0).normal(size=(B, 15, 3)) * 0.1, jnp.float32),
    )
    rel, posed = ehm_transform_mats(model, body)
    assert rel.shape == (B, 55, 3, 3 + 1) or rel.shape == (B, 55, 4, 4)
    assert posed.shape == (B, 55, 3)
    # identity pose -> identity rotations in the transforms
    body0 = body._replace(left_hand_pose=None)
    rel0, _ = ehm_transform_mats(model, body0)
    np.testing.assert_allclose(
        np.asarray(rel0)[:, :, :3, :3],
        np.broadcast_to(np.eye(3), (B, 55, 3, 3)),
        atol=1e-5,
    )
    # mirrored left hand differs
    rel_m, _ = ehm_transform_mats(model, body, mirror_left_hand=True)
    assert float(jnp.abs(rel_m - rel).max()) > 1e-4


def test_mark_visible_frustum_cull():
    """mark_visible = camera-space z > 0.2 (ref: dgr_32/__init__.py:158-172,
    auxiliary.h:151-166 — the NDC bound check is commented out upstream)."""
    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat_project import mark_visible

    cam = Camera(
        R=jnp.eye(3), t=jnp.asarray([0.0, 0.0, 1.0]),
        tanfovx=jnp.asarray(0.5), tanfovy=jnp.asarray(0.5),
        width=32, height=32,
    )
    pts = jnp.asarray(
        [
            [0.0, 0.0, 0.0],    # z_cam = 1.0 -> visible
            [5.0, -5.0, 2.0],   # far off-axis but in front -> visible (no NDC cull)
            [0.0, 0.0, -0.85],  # z_cam = 0.15 <= 0.2 -> culled
            [0.0, 0.0, -3.0],   # behind camera -> culled
        ]
    )
    vis = np.asarray(mark_visible(pts, cam))
    np.testing.assert_array_equal(vis, [True, True, False, False])


def test_fix_motion_injection(tmp_path):
    """tools/fix_motion.py injects coeffs, preserves cameras (ref: fix_json.py)."""
    import pickle
    import sys

    sys.path.insert(0, "tools")
    from fix_motion import fix_motion

    ref = {
        f"{i:06d}": {"smplx_coeffs": {"body_pose": i}, "flame_coeffs": {"exp": i},
                     "w2c": f"cam{i}"}
        for i in range(4)
    }
    custom = {
        f"f{i}": {"smplx_coeffs": {"body_pose": 100 + i},
                  "flame_coeffs": {"exp": 200 + i}}
        for i in range(2)
    }
    rp, cp, op = tmp_path / "ref.pkl", tmp_path / "cus.pkl", tmp_path / "out.pkl"
    rp.write_bytes(pickle.dumps(ref))
    cp.write_bytes(pickle.dumps(custom))
    n = fix_motion(str(rp), str(cp), str(op))
    assert n == 2
    out = pickle.loads(op.read_bytes())
    assert out["000000"]["smplx_coeffs"]["body_pose"] == 100
    assert out["000001"]["flame_coeffs"]["exp"] == 201
    assert out["000002"]["smplx_coeffs"]["body_pose"] == 2  # untouched tail
    assert out["000000"]["w2c"] == "cam0"  # cameras preserved
