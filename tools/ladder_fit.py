"""Fit a minimal-static-row size-class ladder for the bench scene.

The exact (zero-truncation) raster config duplicates every gaussian into
cap >= rect-area slots; the instance sort is data-volume bound (rows x
bitonic passes, CLAUDE.md), and lax.sort pads rows to the next power of
two — so static sort rows are the single knob on the sort's cost. With
the ranked-slice binning (ops/gsplat.py:_bin_nopresort size_classes) a
ladder class is a slice of the area-ranked gaussians with one cap, and
zero truncation needs cap >= max rect area in the slice. Rect areas take
few distinct integer values, so the optimal K-class segmentation is a
tiny DP over distinct values.

Prints the area-vs-rank curve of the REAL bench scene plus optimal
ladders for several K. CPU-only (no blend, no refiner) — safe to run
without the chip.

Run: python tools/ladder_fit.py [--maxk 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_ladder(counts_by_value, values, maxk):
    """DP: segment descending distinct areas `values` (counts per value)
    into <= maxk classes; class cap = its largest value. Returns
    (total_rows, [(count, cap), ...])."""
    m = len(values)
    # prefix[i] = number of gaussians with value index < i
    prefix = [0]
    for c in counts_by_value:
        prefix.append(prefix[-1] + c)
    INF = float("inf")
    # f[k][i] = min rows covering value indices [0, i) with k classes
    f = [[INF] * (m + 1) for _ in range(maxk + 1)]
    back = [[None] * (m + 1) for _ in range(maxk + 1)]
    f[0][0] = 0
    for k in range(1, maxk + 1):
        f[k][0] = 0
        for i in range(1, m + 1):
            best, arg = f[k - 1][i], None  # allow fewer classes
            for j in range(i):
                if f[k - 1][j] == INF:
                    continue
                rows = f[k - 1][j] + (prefix[i] - prefix[j]) * values[j]
                if rows < best:
                    best, arg = rows, j
            f[k][i] = best
            back[k][i] = arg
    total = f[maxk][m]
    # reconstruct
    ladder = []
    i, k = m, maxk
    while i > 0 and k > 0:
        j = back[k][i]
        if j is None:
            k -= 1
            continue
        ladder.append((prefix[i] - prefix[j], values[j]))
        i, k = j, k - 1
    ladder.reverse()
    return total, ladder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxk", type=int, default=10)
    ap.add_argument("--pad8", action="store_true",
                    help="round class counts up to multiples of 8")
    ap.add_argument("--margin", type=float, default=1.0,
                    help="scale every class cap by this factor (safety "
                         "headroom for poses beyond the fitted frames)")
    ap.add_argument("--frames", type=int, default=1,
                    help="fit on the per-gaussian envelope (max) of rect "
                         "areas across the first N bench frames, using "
                         "bench.py's exact pose sequence (body_pose + "
                         "0.01*i)")
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform
    pin_platform("cpu")

    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, tile_rect
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    t0 = time.time()
    cache = "/tmp/ee_scene_cache.npz"
    if args.frames > 1:
        # per-gaussian envelope of rect areas over bench.py's real frame
        # poses — a ladder fit on this envelope is zero-truncation for
        # every frame the bench actually renders, not just frame 0
        from guava_renderer_tpu.avatar.deformer import deform_with_vertices
        from guava_renderer_tpu.benchscene import make_bench_scene
        from guava_renderer_tpu.bodymodel.ehm import ehm_forward

        sc = make_bench_scene()
        size, cam = sc.size, sc.cam
        area_env = None
        valid_any = None
        for i in range(args.frames):
            body = sc.base_body._replace(
                body_pose=sc.base_body.body_pose + 0.01 * i)
            res = ehm_forward(sc.ehm, body, sc.base_flame)
            gs = deform_with_vertices(sc.avatar, res.vertices,
                                      res.vertex_transforms, sc.faces)
            proj = project_gaussians(gs.xyz[0], gs.scaling[0],
                                     gs.rotation[0], gs.opacity[0], cam,
                                     1.0, False)
            v = np.asarray(proj.valid & (proj.alpha >= ALPHA_MIN))
            x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius_bin, size,
                                       size, 32)
            rw, rh = np.asarray(x1 - x0), np.asarray(y1 - y0)
            v = v & (rw > 0) & (rh > 0)
            a = np.where(v, rw * rh, 0).astype(np.int64)
            area_env = a if area_env is None else np.maximum(area_env, a)
            valid_any = v if valid_any is None else (valid_any | v)
            print(f"[ladder] frame {i}: valid={int(v.sum())} "
                  f"max_area={int(a.max())} ({time.time()-t0:.0f}s)",
                  flush=True)
        area = area_env
        valid = valid_any
        P = area.shape[0]
        a_desc = np.sort(area)[::-1]
        print(f"[ladder] ENVELOPE over {args.frames} frames: P={P} "
              f"valid={int(valid.sum())} "
              f"potential_instances={int(area.sum())}")
        _fit_and_print(args, np, area, valid, P, a_desc)
        return
    if os.path.exists(cache):
        from guava_renderer_tpu.core.cameras import Camera
        z = np.load(cache)
        size = int(z["size"])
        cam = Camera(R=jnp.asarray(z["R"]), t=jnp.asarray(z["t"]),
                     tanfovx=jnp.asarray(z["tanfovx"]),
                     tanfovy=jnp.asarray(z["tanfovy"]),
                     width=size, height=size)
        xyz, scaling, rotation, opacity = (
            jnp.asarray(z["xyz"]), jnp.asarray(z["scaling"]),
            jnp.asarray(z["rotation"]), jnp.asarray(z["opacity"]))
        print(f"[ladder] scene (cached from tools/ee_probe.py --cache) "
              f"{time.time()-t0:.0f}s", flush=True)
    else:
        from guava_renderer_tpu.benchscene import make_bench_scene, \
            frame0_gaussians
        sc = make_bench_scene()
        gs = frame0_gaussians(sc)
        size, cam = sc.size, sc.cam
        xyz, scaling, rotation, opacity = (
            gs.xyz[0], gs.scaling[0], gs.rotation[0], gs.opacity[0])
        print(f"[ladder] scene {time.time()-t0:.0f}s", flush=True)

    proj = project_gaussians(xyz, scaling, rotation, opacity, cam, 1.0,
                             False)
    valid = np.asarray(proj.valid & (proj.alpha >= ALPHA_MIN))
    x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius_bin, size,
                               size, 32)
    rw = np.asarray(x1 - x0)
    rh = np.asarray(y1 - y0)
    valid = valid & (rw > 0) & (rh > 0)
    area = np.where(valid, rw * rh, 0).astype(np.int64)
    P = area.shape[0]
    a_desc = np.sort(area)[::-1]
    print(f"[ladder] P={P} valid={int(valid.sum())} "
          f"potential_instances={int(area.sum())}")
    for r in (0, 64, 256, 1024, 4096, 8192, 16384, 32768, 65536, 131072):
        if r < P:
            print(f"[ladder] area at rank {r}: {int(a_desc[r])}")

    _fit_and_print(args, np, area, valid, P, a_desc)


def _fit_and_print(args, np, area, valid, P, a_desc):
    import math

    vals, cnts = np.unique(area[area > 0], return_counts=True)
    if not len(vals):
        print("[ladder] no valid gaussians (every area == 0) — nothing "
              "to fit")
        return
    m = args.margin
    # DP cost uses the margin-scaled caps the deployed ladder would carry
    vals = [int(math.ceil(v * m)) for v in vals[::-1].tolist()]  # descending
    cnts = cnts[::-1].tolist()
    # gaussians with area == 0 (invalid) need no class rows but sit in the
    # ranked tail; the base slice covers them with the last cap (their
    # slots all emit invalid). Keep them in the final class's count.
    n_zero = int((area == 0).sum())
    print(f"[ladder] distinct areas={len(vals)} max={vals[0]} "
          f"margin={m} zero-area(invalid)={n_zero}")

    for K in (4, 6, 8, args.maxk):
        total, ladder = fit_ladder(cnts, vals, K)
        # the last class is the structural base (cap = tpg); invalid-tail
        # gaussians fall into it at no extra static rows requirement, but
        # the ranked-slice base covers ranks [start, P) so its static rows
        # include the invalid tail too.
        classes = ladder[:-1]
        # base tpg floor 2 when a margin is requested (headroom for the
        # tail class growing past its fitted area in unfitted poses);
        # margin 1.0 = the caller wants the exact envelope optimum
        tpg = ladder[-1][1] if m <= 1.0 else max(2, ladder[-1][1])
        base_n = P - sum(c for c, _ in classes)
        rows = sum(c * v for c, v in classes) + base_n * tpg
        if args.pad8:
            classes = [((c + 7) // 8 * 8, v) for c, v in classes]
            base_n = P - sum(c for c, _ in classes)
            rows = sum(c * v for c, v in classes) + base_n * tpg
        print(f"[ladder] K={K}: static_rows={rows} "
              f"(pow2 pad -> {1 << int(np.ceil(np.log2(rows)))}) "
              f"tpg={tpg} classes={classes}")


if __name__ == "__main__":
    main()
