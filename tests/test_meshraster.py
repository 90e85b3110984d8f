"""Mesh z-buffer rasterizer tests: analytic scenes + numpy oracle."""

import jax.numpy as jnp
import numpy as np

from guava_renderer_tpu.core.cameras import Camera
from guava_renderer_tpu.ops.meshraster import (
    interpolate_attributes,
    rasterize_mesh,
    visible_faces_mask,
)


def make_cam(size=32):
    return Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        tanfovx=jnp.asarray(0.5), tanfovy=jnp.asarray(0.5),
        width=size, height=size,
    )


def test_single_triangle_coverage_and_depth():
    cam = make_cam(32)
    # big triangle covering image center at z=2
    verts = jnp.asarray(
        [[-0.8, -0.8, 2.0], [0.8, -0.8, 2.0], [0.0, 0.9, 2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    res = rasterize_mesh(verts, faces, cam)
    assert int(res.face_idx[16, 16]) == 0
    np.testing.assert_allclose(res.depth[16, 16], 2.0, atol=1e-4)
    # corners empty
    assert int(res.face_idx[0, 0]) == -1
    assert np.isinf(float(res.depth[0, 0]))
    vis = visible_faces_mask(res.face_idx, 1)
    assert bool(vis[0])


def test_occlusion():
    cam = make_cam(32)
    verts = jnp.asarray(
        [
            # far triangle (covers center)
            [-0.8, -0.8, 4.0], [0.8, -0.8, 4.0], [0.0, 0.9, 4.0],
            # near small triangle (covers center too)
            [-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.25, 2.0],
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    res = rasterize_mesh(verts, faces, cam)
    assert int(res.face_idx[16, 16]) == 1  # near wins
    np.testing.assert_allclose(res.depth[16, 16], 2.0, atol=1e-4)
    # outside near triangle, far is visible (pixel y=12, x=11)
    assert int(res.face_idx[12, 11]) == 0
    vis = visible_faces_mask(res.face_idx, 2)
    assert bool(vis[0]) and bool(vis[1])


def test_behind_camera_culled():
    cam = make_cam(16)
    verts = jnp.asarray(
        [[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0], [0.0, 0.5, -2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    res = rasterize_mesh(verts, faces, cam)
    assert int((res.face_idx >= 0).sum()) == 0


def test_bary_interpolation():
    cam = make_cam(32)
    verts = jnp.asarray(
        [[-0.9, -0.9, 2.0], [0.9, -0.9, 2.0], [0.0, 0.95, 2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    res = rasterize_mesh(verts, faces, cam)
    # interpolate vertex positions back: the recovered xy must reproject to
    # the pixel location
    attr = interpolate_attributes(res, faces, verts)
    from guava_renderer_tpu.core.cameras import project_points

    hit_y, hit_x = np.nonzero(np.asarray(res.face_idx) >= 0)
    take = slice(0, len(hit_y), max(1, len(hit_y) // 50))
    pts = jnp.asarray(np.asarray(attr)[hit_y[take], hit_x[take]])
    pix, _ = project_points(cam, pts)
    np.testing.assert_allclose(pix[:, 0], hit_x[take], atol=0.02)
    np.testing.assert_allclose(pix[:, 1], hit_y[take], atol=0.02)


def test_random_mesh_against_numpy_oracle(rng):
    cam = make_cam(32)
    V, F = 30, 24
    verts = np.zeros((V, 3), np.float32)
    verts[:, 0] = rng.uniform(-0.7, 0.7, V)
    verts[:, 1] = rng.uniform(-0.7, 0.7, V)
    verts[:, 2] = rng.uniform(1.5, 4.0, V)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    res = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), cam)

    # numpy oracle: brute force edge functions on all pixels
    from guava_renderer_tpu.core.cameras import project_points

    pix, z = project_points(cam, jnp.asarray(verts))
    pix, z = np.asarray(pix), np.asarray(z)
    best = np.full((32, 32), -1, np.int64)
    bz = np.full((32, 32), np.inf)
    ys, xs = np.mgrid[0:32, 0:32].astype(np.float64)
    for f in range(F):
        a, b, c = pix[faces[f]]
        za, zb, zc = z[faces[f]]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(det) < 1e-12:
            det = 1e-12
        w0 = ((b[0] - xs) * (c[1] - ys) - (b[1] - ys) * (c[0] - xs)) / det
        w1 = ((c[0] - xs) * (a[1] - ys) - (c[1] - ys) * (a[0] - xs)) / det
        w2 = 1 - w0 - w1
        zi = w0 * za + w1 * zb + w2 * zc
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6) & (zi > 0)
        upd = inside & (zi < bz)
        best[upd] = f
        bz[upd] = zi[upd]

    agree = (np.asarray(res.face_idx) == best).mean()
    assert agree > 0.995, f"face-id agreement {agree}"


def test_textured_mesh_preview():
    from guava_renderer_tpu.ops.mesh_preview import (
        render_mesh_attributes,
        render_textured_mesh,
    )

    cam = make_cam(32)
    verts = jnp.asarray(
        [[-0.8, -0.8, 2.0], [0.8, -0.8, 2.0], [0.0, 0.9, 2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    texcoords = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], jnp.float32)
    texture = jnp.ones((16, 16, 3)) * 0.5
    rgb, alpha = render_textured_mesh(verts, faces, faces, texcoords, texture, cam)
    assert rgb.shape == (32, 32, 3)
    np.testing.assert_allclose(float(rgb[16, 16, 0]), 0.5, atol=1e-3)
    assert float(alpha[0, 0, 0]) == 0.0

    attrs, alpha2 = render_mesh_attributes(verts, faces, verts, cam)
    # interpolated positions reproject onto the pixel (checked in bary test);
    # here just verify coverage agreement
    np.testing.assert_array_equal(np.asarray(alpha)[..., 0] > 0, np.asarray(alpha2)[..., 0] > 0)
