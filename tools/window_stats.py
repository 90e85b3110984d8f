"""Rect/window statistics for the parity scene — sizing data for the
windowed rasterizer design.

The blend kernel is descriptor-issue bound (~60 ns/row regardless of
semaphore banks, outputs/bench/dma_bench_r3/results.log): 241k valid
instances x 60 ns fully explains the measured 13.3 ms blend stage. The
escape is trading 241k single-row gathers for a few CONTIGUOUS window DMAs
per tile: sort gaussians by center tile (row-major), then tile t's
contributors with rect <= (2R+1)^2 all lie in 2R+1 contiguous runs of the
center-tile order. This script reports, on the exact bench.py parity scene
(CPU), the numbers that size that design:

  - rect-size distribution of valid gaussians (what R covers 99.x%)
  - per-tile candidate-window sizes (VMEM bound, run lengths)
  - instance count vs window-bytes tradeoff

Usage: python tools/window_stats.py [--size 512] [--uv 512] [--tile 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--uv", type=int, default=512)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--body-side", type=int, default=101)
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform("cpu")

    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices
    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.bodymodel import synthetic_ehm
    from guava_renderer_tpu.bodymodel.ehm import (
        BodyParams, EhmModel, FlameParams, ehm_forward,
    )
    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians, tile_rect

    INVTANFOV = 24.0
    size, uv, tile = args.size, args.uv, args.tile

    smplx, flame_m, extras = synthetic_ehm(
        body_side=args.body_side, head_side=15, uv_size=uv, n_shape=50, n_exp=20
    )
    ehm = EhmModel.build(smplx, flame_m, extras)
    faces = jnp.asarray(smplx.faces)
    V = smplx.num_vertices
    N_uv = uv * uv
    rng = np.random.default_rng(0)
    uv_valid = jnp.asarray(extras.uvmap_mask.reshape(-1))

    def mk(shape, lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    def trained_stats_scales(n, base):
        u = rng.uniform(0, 1, n)
        s = np.where(
            u < 0.85, rng.lognormal(-4.2, 0.3, n),
            np.where(u < 0.95, rng.lognormal(-3.0, 0.3, n),
                     rng.lognormal(-1.9, 0.4, n)),
        ) * base
        aniso = rng.lognormal(0, 0.2, (n, 2))
        return jnp.asarray(
            np.stack([s, s * aniso[:, 0], s * aniso[:, 1]], -1), jnp.float32
        )[None]

    def trained_stats_opacity(n):
        return jnp.asarray(
            1.0 / (1.0 + np.exp(-rng.normal(-1.0, 1.5, (1, n, 1)))), jnp.float32
        )

    quats = rng.normal(size=(1, V, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    uv_quats = rng.normal(size=(1, N_uv, 4)).astype(np.float32)
    uv_quats /= np.linalg.norm(uv_quats, axis=-1, keepdims=True)

    avatar = GaussianAvatar(
        vtx_positions=jnp.asarray(smplx.v_template)[None],
        vtx_colors=mk((1, V, 32), 0, 1),
        vtx_opacity=trained_stats_opacity(V),
        vtx_scales=trained_stats_scales(V, 0.7),
        vtx_rotations=jnp.asarray(quats),
        uv_local_xyz=mk((1, N_uv, 3), -0.5, 0.5),
        uv_colors=mk((1, N_uv, 32), 0, 1),
        uv_opacity=trained_stats_opacity(N_uv),
        uv_scales=trained_stats_scales(N_uv, 40.0),
        uv_rotations=jnp.asarray(uv_quats),
        uv_binding_face=jnp.asarray(extras.uvmap_f_idx.reshape(-1)),
        uv_face_bary=jnp.asarray(extras.uvmap_f_bary.reshape(-1, 3)),
        uv_valid=uv_valid,
    )

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 30.0
    cam = Camera(
        R=jnp.asarray(w2c[:3, :3]), t=jnp.asarray(w2c[:3, 3]),
        tanfovx=jnp.asarray(1.0 / INVTANFOV), tanfovy=jnp.asarray(1.0 / INVTANFOV),
        width=size, height=size,
    )

    body = BodyParams(shape=jnp.zeros((1, smplx.n_shape)),
                      body_pose=jnp.zeros((1, 21, 3)))
    flame = FlameParams(shape=jnp.zeros((1, smplx.n_shape)),
                        exp=jnp.zeros((1, smplx.n_exp)), jaw=jnp.zeros((1, 3)))
    res = ehm_forward(ehm, body, flame)
    gs = deform_with_vertices(avatar, res.vertices, res.vertex_transforms, faces)

    proj = project_gaussians(gs.xyz[0], gs.scaling[0], gs.rotation[0],
                             gs.opacity[0], cam)
    x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius_bin, size, size, tile)
    x0, y0, x1, y1 = map(np.asarray, (x0, y0, x1, y1))
    valid = np.array(proj.valid) & (np.array(proj.alpha) >= ALPHA_MIN)
    rw, rh = x1 - x0, y1 - y0
    valid = valid & (rw > 0) & (rh > 0)
    gx = (size + tile - 1) // tile

    P = valid.sum()
    inst = np.where(valid, rw * rh, 0)
    print(f"P_total={len(valid)} P_valid={P} instances={inst.sum()}")
    side = np.maximum(rw, rh)[valid]
    for R in (1, 2, 3, 4):
        frac = float((side <= 2 * R - 1).mean())
        print(f"  rect side <= {2*R-1} (window R={R-1}): {frac:.4%}")
    print(f"  max rect side: {side.max()}  "
          f"p99={np.percentile(side, 99):.0f} p999={np.percentile(side, 99.9):.0f}")

    # center tile of each valid gaussian
    mean2d = np.asarray(proj.mean2d)[valid]
    cx = np.clip((mean2d[:, 0] // tile).astype(int), 0, gx - 1)
    cy = np.clip((mean2d[:, 1] // tile).astype(int), 0, gx - 1)
    ctile = cy * gx + cx
    counts = np.bincount(ctile, minlength=gx * gx)
    print(f"gaussians per center tile: mean={counts.mean():.0f} "
          f"max={counts.max()} p99={np.percentile(counts, 99):.0f}")

    # row-duplicated design: one instance per covered TILE-ROW; each
    # tile-row's run is contiguous and depth-sorted after one
    # (row, depth)-sort; rw rides in the row so the blend restricts
    # each gaussian to its covered columns.
    row_inst = np.where(valid, rh, 0)
    print(f"row-instances (sum rh) = {row_inst.sum()} "
          f"(vs tile-instances {inst.sum()}); "
          f"bytes/frame={row_inst.sum() * 512 / 1e6:.1f} MB")
    gy = gx
    rows_hist = np.zeros(gy, np.int64)
    yv0, rhv = y0[valid], rh[valid]
    for r in range(gy):
        rows_hist[r] = ((yv0 <= r) & (yv0 + rhv > r)).sum()
    print(f"per-tile-row run length: mean={rows_hist.mean():.0f} "
          f"max={rows_hist.max()} "
          f"(VMEM if resident: max {rows_hist.max() * 512 / 1024:.0f} KiB)")

    # conservative ellipse-distance instance culling: an instance (g, tile)
    # contributes only if max_alpha over the tile >= 1/255. A safe bound:
    # power >= 0.5*lam_min*d(mean, rect)^2 with lam_min the smallest conic
    # eigenvalue, so cull when opa*exp(-0.5*lam_min*d^2) < 1/255.
    conic = np.asarray(proj.conic)[valid]
    if True:
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        opa = np.asarray(proj.alpha)[valid]
        tr = 0.5 * (ca + cc)
        det = ca * cc - cb * cb
        lam_min = tr - np.sqrt(np.maximum(tr * tr - det, 0.0))
        mx, my = mean2d[:, 0], mean2d[:, 1]
        kept = total = 0
        x0v, y0v, rwv, rhv = x0[valid], y0[valid], rw[valid], rh[valid]
        thr = np.log(np.maximum(opa * 255.0, 1.0 + 1e-6))  # power budget
        for dy in range(int(rhv.max())):
            for dx in range(int(rwv.max())):
                m = (dx < rwv) & (dy < rhv)
                if not m.any():
                    continue
                tx0 = (x0v[m] + dx) * tile
                ty0 = (y0v[m] + dy) * tile
                ddx = mx[m] - np.clip(mx[m], tx0, tx0 + tile - 1)
                ddy = my[m] - np.clip(my[m], ty0, ty0 + tile - 1)
                d2 = ddx * ddx + ddy * ddy
                keep = 0.5 * lam_min[m] * d2 <= thr[m]
                kept += int(keep.sum())
                total += int(m.sum())
        print(f"ellipse-distance cull: kept {kept}/{total} instances "
              f"({kept/max(total,1):.1%}) — blend descriptors scale with this")

    # window candidate count per tile for R=1 (3x3 neighborhood)
    for R in (1, 2):
        grid = counts.reshape(gx, gx)
        padded = np.pad(grid, R)
        wins = np.zeros((gx, gx), np.int64)
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                wins += padded[R + dy:R + dy + gx, R + dx:R + dx + gx]
        rows = 2 * R + 1
        runs = rows  # one contiguous run per center-tile row of the window
        print(f"window R={R} ({rows}x{rows}): candidates/tile mean={wins.mean():.0f} "
              f"max={wins.max()} p99={np.percentile(wins, 99):.0f}; "
              f"VMEM max={wins.max() * 512 / 1024:.0f} KiB; "
              f"total window bytes/frame={wins.sum() * 512 / 1e6:.1f} MB; "
              f"descriptors/frame~{runs * gx * gx}")


if __name__ == "__main__":
    main()
