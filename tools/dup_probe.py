"""Duplication-stage layout probe (round 5).

stages7 (outputs/bench/tpu_window_r5a/ee_stages7_pw16.log) shows the
duplication stage is 12.8 ms/frame — 45% of the grouped raster frame —
and the rank gathers another 5.0 ms, while the feared instance sort is
0.7 ms. Hypothesis: every `(n, cap)` intermediate in _dup_tiles /
_slot_qmin pads its minor dim to 128 lanes (cap=4 class: 32x wasted
traffic + a lane-dim bitonic sort at pw=16). A `(cap, n)` layout keeps
slots on SUBLANES (8-pad only) and gaussians on lanes.

Variants (per class ladder, priority_window as flagged):
  base   — _dup_tiles as shipped ((n, cap) lanes layout)
  tpose  — (cap, n) compute + final transpose back to (n, cap) flatten
           (bit-identical instance order to base)
  slotm  — (cap, n) compute, slot-major flatten (no back-transpose;
           changes only stable-sort tie order between equal packed keys)

Each variant runs the FULL duplication for all ladder classes + base on
the cached bench scene's frame-0 projection, in a jitted fori_loop with a
scalar data dependency (CLAUDE.md: block_until_ready doesn't sync through
the tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="173:256,892:100,1528:49,2868:30,"
                    "3858:16,11177:9,128417:4")
    ap.add_argument("--tpg", type=int, default=2)
    ap.add_argument("--priority-window", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--variants", default="base,tpose,slotm")
    ap.add_argument("--subset", type=int, default=0,
                    help="probe only the first N gaussians (CPU smoke)")
    ap.add_argument("--with-sort", action="store_true",
                    help="append the packed-key instance sort + gid flatten "
                    "(the full post-gather bin) to each variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import (
        ALPHA_MIN, RasterizeSettings, _cull_qcut, _dup_tiles,
        _pack_sort_key, _slot_qmin)
    from guava_renderer_tpu.ops.gsplat_project import (
        project_gaussians, tile_rect)
    from guava_renderer_tpu.core.cameras import Camera

    cache = "/tmp/ee_scene_cache.npz"
    if not os.path.exists(cache):
        print("[dup] no scene cache — run tools/ee_probe.py --cache first")
        return 1
    z = np.load(cache)
    sub = slice(0, args.subset) if args.subset else slice(None)
    xyz, opac = jnp.asarray(z["xyz"][sub]), jnp.asarray(z["opacity"][sub])
    scales = jnp.asarray(z["scaling"][sub])
    rots = jnp.asarray(z["rotation"][sub])
    size = int(z["size"])
    args.size = size
    cam = Camera(R=jnp.asarray(z["R"]), t=jnp.asarray(z["t"]),
                 tanfovx=jnp.asarray(z["tanfovx"]),
                 tanfovy=jnp.asarray(z["tanfovy"]),
                 width=size, height=size)
    P = int(xyz.shape[0])
    ladder = tuple(
        (int(a), int(b))
        for a, b in (p.split(":") for p in args.ladder.split(",") if p))
    tile = args.tile
    gx = args.size // tile
    num_tiles = gx * gx
    pw = args.priority_window
    print(f"[dup] P={P} ladder={ladder} pw={pw} tpg={args.tpg}", flush=True)

    def project(pose_scale, with_cp=True, pack_rect=False):
        proj = project_gaussians(
            xyz + pose_scale, scales, rots, opac, cam, 1.0, False)
        valid = proj.valid & (proj.alpha >= ALPHA_MIN)
        x0, y0, x1, y1 = tile_rect(
            proj.mean2d, proj.radius_bin, args.size, args.size, tile)
        rw, rh = x1 - x0, y1 - y0
        valid = valid & (rw > 0) & (rh > 0)
        need = jnp.where(valid, rw * rh, -1)
        id_bits = max(1, int(P - 1).bit_length())
        packed_need = ((need + 1) << id_bits) | jnp.arange(P, dtype=jnp.int32)
        ranked = jax.lax.sort(packed_need)[::-1] & ((1 << id_bits) - 1)
        rg = lambda a: a[ranked]  # noqa: E731
        if with_cp:
            qcut = _cull_qcut(proj.conic, proj.alpha)
            cp = tuple(rg(a) for a in (
                proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
                proj.conic[:, 1], proj.conic[:, 2], qcut))
        else:
            cp = None
        dk = rg(jax.lax.bitcast_convert_type(proj.depth, jnp.int32))
        if pack_rect:
            # ONE gather of a packed (x0|y0|rw|rh|valid) i32 instead of 5:
            # tile coords/extents fit 5 bits each at 512^2/tile32 (gx=16)
            packed = (x0 | (y0 << 5) | (rw << 10) | (rh << 15)
                      | valid.astype(jnp.int32) << 20)
            pr = rg(packed)
            x0r, y0r = pr & 31, (pr >> 5) & 31
            rwr, rhr = (pr >> 10) & 31, (pr >> 15) & 31
            vr = ((pr >> 20) & 1).astype(bool)
            return (x0r, y0r, rwr, rhr, vr, ranked, dk, cp)
        return (rg(x0), rg(y0), rg(rw), rg(rh), rg(valid), ranked, dk, cp)

    def dup_tpose(x0_, y0_, rw_, rh_, valid_, cap, cp_, window, slot_major):
        """(cap, n)-layout duplication; math mirrors _dup_tiles."""
        n = x0_.shape[0]
        rm_cap = cap if (cp_ is None or not window) else max(
            2 * cap, min(window, num_tiles))
        rw_c = jnp.minimum(rw_, rm_cap)[None, :]
        rh_c = jnp.minimum(rh_, (rm_cap + rw_c[0] - 1)
                           // jnp.maximum(rw_c[0], 1))[None, :]
        d = jnp.arange(rm_cap, dtype=jnp.int32)[:, None]
        dy = d // jnp.maximum(rw_c, 1)
        dx = d % jnp.maximum(rw_c, 1)
        in_rect = valid_[None, :] & (dy < rh_c)
        tx = x0_[None, :] + dx
        ty = y0_[None, :] + dy
        if cp_ is None:
            tid = jnp.where(in_rect, ty * gx + tx, num_tiles).astype(jnp.int32)
            return tid.reshape(-1) if slot_major else tid.T.reshape(-1)
        mx, my, ca, cb, cc, qcut = cp_
        qmin = _slot_qmin_t(tx, ty, mx, my, ca, cb, cc, tile)
        keep = in_rect & (qmin <= qcut[None, :])
        tid = (ty * gx + tx).astype(jnp.int32)
        if rm_cap == cap:
            out = jnp.where(keep, tid, num_tiles).astype(jnp.int32)
            return out.reshape(-1) if slot_major else out.T.reshape(-1)
        key = jnp.where(keep, qmin, jnp.inf)
        key_s, tid_s = jax.lax.sort((key, tid), dimension=0, num_keys=1)
        key_s = key_s[:cap]
        tid_s = tid_s[:cap]
        out = jnp.where(jnp.isfinite(key_s), tid_s, num_tiles).astype(jnp.int32)
        return out.reshape(-1) if slot_major else out.T.reshape(-1)

    def _slot_qmin_t(tx, ty, mx, my, ca, cb, cc, tile_px):
        mx, my = mx[None, :], my[None, :]
        ca_, cb_, cc_ = ca[None, :], cb[None, :], cc[None, :]
        bx0 = tx.astype(jnp.float32) * tile_px - mx
        bx1 = bx0 + (tile_px - 1)
        by0 = ty.astype(jnp.float32) * tile_px - my
        by1 = by0 + (tile_px - 1)

        def edge_x(e):
            dyv = jnp.clip(-cb_ * e / jnp.maximum(cc_, 1e-20), by0, by1)
            return (ca_ * e + 2.0 * cb_ * dyv) * e + cc_ * dyv * dyv

        def edge_y(e):
            dxv = jnp.clip(-cb_ * e / jnp.maximum(ca_, 1e-20), bx0, bx1)
            return (cc_ * e + 2.0 * cb_ * dxv) * e + ca_ * dxv * dxv

        qmin = jnp.minimum(
            jnp.minimum(edge_x(bx0), edge_x(bx1)),
            jnp.minimum(edge_y(by0), edge_y(by1)))
        inside = (bx0 <= 0.0) & (bx1 >= 0.0) & (by0 <= 0.0) & (by1 >= 0.0)
        return jnp.where(inside, 0.0, qmin)

    def classes_apply(arrs, fn):
        """fn(x0, y0, rw, rh, valid, cp, cap, slice) per ladder class+base."""
        x0, y0, rw, rh, valid, ranked, dk, cp = arrs
        cps = (lambda s: tuple(a[s] for a in cp)) if cp is not None \
            else (lambda s: None)
        outs = []
        start = 0
        for count, cap in ladder:
            count = min(int(count), P - start)
            if count <= 0:
                break
            s = slice(start, start + count)
            outs.append(fn(x0[s], y0[s], rw[s], rh[s], valid[s],
                           cps(s), int(cap), s))
            start += count
        s = slice(start, P)
        outs.append(fn(x0[s], y0[s], rw[s], rh[s], valid[s],
                       cps(s), args.tpg, s))
        return outs, start

    def make_fn(variant):
        # variant grammar: layout[+mods] — layout in {base, tpose, slotm};
        # mods: nocull (cp=None: skip the 6 cull-param gathers + all qmin
        # work; bit-exact — the blend's alpha floor skips those pixels
        # anyway), packrect (one packed rect gather instead of 5)
        parts = variant.split("+")
        layout = parts[0]
        nocull = "nocull" in parts[1:]
        packrect = "packrect" in parts[1:]

        def f(pose_scale):
            arrs = project(pose_scale, with_cp=not nocull,
                           pack_rect=packrect)
            _, _, _, _, _, ranked, dk, _ = arrs

            def dup_c(x0_, y0_, rw_, rh_, valid_, cp_, cap, s):
                if layout == "base":
                    return _dup_tiles(x0_, y0_, rw_, rh_, valid_, cap, cp_,
                                      tile, gx, num_tiles, pw).reshape(-1)
                return dup_tpose(x0_, y0_, rw_, rh_, valid_, cap, cp_, pw,
                                 slot_major=(layout == "slotm"))

            outs, _ = classes_apply(arrs, dup_c)
            tile_flat = jnp.concatenate(outs)
            if args.with_sort:
                def gids_c(x0_, y0_, rw_, rh_, valid_, cp_, cap, s):
                    g = jnp.broadcast_to(
                        ranked[s][:, None], (s.stop - s.start, cap))
                    d_ = jnp.broadcast_to(
                        dk[s][:, None], (s.stop - s.start, cap))
                    if variant == "slotm":
                        g = jnp.broadcast_to(
                            ranked[s][None, :], (cap, s.stop - s.start))
                        d_ = jnp.broadcast_to(
                            dk[s][None, :], (cap, s.stop - s.start))
                    return g.reshape(-1), d_.reshape(-1)
                gd, _ = classes_apply(arrs, gids_c)
                gid_flat = jnp.concatenate([g for g, _ in gd])
                dk_flat = jnp.concatenate([d for _, d in gd])
                key, nkeys = _pack_sort_key(tile_flat, dk_flat, num_tiles)
                out = jax.lax.sort((*key, gid_flat), num_keys=nkeys)
                return (jnp.float32(jnp.sum(out[nkeys])) * 1e-12
                        + jnp.float32(jnp.sum(out[0])) * 1e-15)
            return (jnp.float32(jnp.sum(tile_flat)) * 1e-12)

        def loop(_):
            def body(i, acc):
                return acc + f(acc * 1e-30 + jnp.float32(0))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        return loop

    for variant in args.variants.split(","):
        fn = jax.jit(make_fn(variant))
        tc = time.time()
        v = jax.block_until_ready(fn(0))
        tc = time.time() - tc
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(fn(0))
            reps.append((time.time() - ts) / args.iters * 1e3)
        print(f"[dup] {variant}{'+sort' if args.with_sort else ''}: "
              f"{min(reps):.2f} ms/frame (reps {[f'{x:.2f}' for x in reps]}, "
              f"compile {tc:.0f}s, acc={float(v):.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
