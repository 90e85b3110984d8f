"""Regenerate the committed rasterizer golden artifact.

Renders a fixed synthetic scene with the DENSE ORACLE (gsplat_reference) on
CPU and stores scene + outputs in tests/golden/raster_scene_v1.npz. The
committed npz is a cross-round regression anchor: if a kernel change shifts
the image, tests/test_golden_regression.py fails even when kernel and oracle
drift together. Only regenerate on an intentional, documented semantics
change (bump the version suffix).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene(P=96, C=32, size=64, seed=1234):
    rng = np.random.default_rng(seed)
    means = np.zeros((P, 3), np.float32)
    means[:, 0] = rng.uniform(-0.6, 0.6, P)
    means[:, 1] = rng.uniform(-0.6, 0.6, P)
    means[:, 2] = rng.uniform(2.5, 3.5, P)
    colors = rng.uniform(0, 1, (P, C)).astype(np.float32)
    opac = rng.uniform(0.1, 0.95, (P, 1)).astype(np.float32)
    scales = rng.uniform(0.015, 0.09, (P, 3)).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    bg = np.linspace(0.0, 1.0, C).astype(np.float32)
    return dict(means=means, colors=colors, opacity=opac, scales=scales,
                quats=quats, bg=bg, size=np.asarray(size), tanfov=np.asarray(0.5))


def build_mesh_scene(n=14, size=64, seed=77):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-0.8, 0.8, (n * n, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(2.0, 4.0, n * n)
    # grid triangulation over the random points for deterministic topology
    idx = np.arange(n * n).reshape(n, n)
    f1 = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[:-1, 1:]], -1).reshape(-1, 3)
    f2 = np.stack([idx[1:, :-1], idx[1:, 1:], idx[:-1, 1:]], -1).reshape(-1, 3)
    faces = np.concatenate([f1, f2]).astype(np.int32)
    return dict(verts=verts, faces=faces, size=np.asarray(size),
                tanfov=np.asarray(0.6))


def main():
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform("cpu")
    import jax.numpy as jnp

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat_reference import rasterize_reference

    s = build_scene()
    cam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        tanfovx=jnp.asarray(float(s["tanfov"])), tanfovy=jnp.asarray(float(s["tanfov"])),
        width=int(s["size"]), height=int(s["size"]),
    )
    color, radii, invd = rasterize_reference(
        jnp.asarray(s["means"]), jnp.asarray(s["colors"]), jnp.asarray(s["opacity"]),
        jnp.asarray(s["scales"]), jnp.asarray(s["quats"]), cam, jnp.asarray(s["bg"]),
    )
    out = dict(s)
    out.update(color=np.asarray(color), radii=np.asarray(radii), invdepth=np.asarray(invd))
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "raster_scene_v1.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {os.path.abspath(path)}: color {out['color'].shape}, "
          f"mean {out['color'].mean():.5f}")

    # mesh z-buffer anchor: the Pallas kernel IS the source here (it has its
    # own numpy-oracle tests); the committed artifact pins cross-round drift
    from guava_renderer_tpu.ops.meshraster import rasterize_mesh

    ms = build_mesh_scene()
    mcam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        tanfovx=jnp.asarray(float(ms["tanfov"])), tanfovy=jnp.asarray(float(ms["tanfov"])),
        width=int(ms["size"]), height=int(ms["size"]),
    )
    res = rasterize_mesh(jnp.asarray(ms["verts"]), jnp.asarray(ms["faces"]), mcam)
    mout = dict(ms)
    mout.update(
        face_idx=np.asarray(res.face_idx),
        bary=np.asarray(res.bary),
        depth=np.asarray(res.depth),
    )
    mpath = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                         "meshraster_scene_v1.npz")
    np.savez_compressed(mpath, **mout)
    cov = float((mout["face_idx"] >= 0).mean())
    print(f"wrote {os.path.abspath(mpath)}: coverage {cov:.3f}")


if __name__ == "__main__":
    main()
