"""Grouped-frame glue probe (round 5).

ee stages6 measured the grouped G=4 raster frame at 28.39 ms while its
parts sum to ~24.9 (prep 20.3 + blend 4.6): ~3.5 ms of glue. After the
packed-rect + no-cull binning landed (bin path 20.3 -> ~7.5,
dup_probe_pw0.log) the glue is a bigger fraction. Variants, all on the
cached bench scene (tools/ee_probe.py --cache), rasterize_prep -> blend:

  two        — the shipped structure: fori_loop prep xG with
               dynamic_update_slice into stacked HBM buffers, then
               fori_loop blend xG with dynamic_slice reads (bench.py)
  vprep      — jax.vmap(prep) over the G pose scalars producing the
               stacked buffers directly (no DUS copies), then the same
               blend loop
  preponly / vpreponly — the prep phase alone (fori vs vmap)
  blendonly  — blend xG from prestacked CONSTANT buffers (cost of the
               blend phase alone inside the grouped structure)

Each runs in a jitted fori_loop over n_groups with a scalar data
dependency (CLAUDE.md: block_until_ready does not sync through the
tunnel).
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
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--iters", type=int, default=48,
                    help="frames per timed rep (multiple of group)")
    ap.add_argument("--tile-cull", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--bf16-rows", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--variants",
                    default="two,vprep,preponly,vpreponly,blendonly")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import (
        RasterizeSettings, RasterPrep, rasterize_blend, rasterize_prep)

    cache = "/tmp/ee_scene_cache.npz"
    if not os.path.exists(cache):
        print("[grp] no scene cache — run tools/ee_probe.py --cache first")
        return 1
    z = np.load(cache)
    xyz = jnp.asarray(z["xyz"])
    colors = jnp.asarray(z["colors"])
    opac = jnp.asarray(z["opacity"])
    scales = jnp.asarray(z["scaling"])
    rots = jnp.asarray(z["rotation"])
    size = int(z["size"])
    cam = Camera(R=jnp.asarray(z["R"]), t=jnp.asarray(z["t"]),
                 tanfovx=jnp.asarray(z["tanfovx"]),
                 tanfovy=jnp.asarray(z["tanfovy"]),
                 width=size, height=size)
    ladder = tuple(
        (int(a), int(b))
        for a, b in (p.split(":") for p in args.ladder.split(",") if p))
    st = RasterizeSettings(
        tile=32, chunk=32, max_tiles_per_gaussian=args.tpg,
        size_classes=ladder, tile_cull=args.tile_cull,
        bf16_rows=args.bf16_rows)
    bg = jnp.zeros(32)
    G = args.group
    iters = (args.iters // G) * G
    print(f"[grp] P={xyz.shape[0]} G={G} ladder={ladder} "
          f"cull={args.tile_cull} bf16_rows={args.bf16_rows}", flush=True)

    def prep(pose_scale):
        return rasterize_prep(xyz + pose_scale * 1e-30, colors, opac,
                              scales, rots, cam, st)

    shapes = jax.eval_shape(prep, 0.0)
    tbl_sh, ord_sh, rng_sh = (shapes.table.shape, shapes.order.shape,
                              shapes.ranges.shape)

    def blend_sum(tbl, od, rg, acc):
        def blend_g(g, a):
            t_ = jax.lax.dynamic_slice(tbl, (g, 0, 0), (1,) + tbl_sh)[0]
            o_ = jax.lax.dynamic_slice(od, (g, 0), (1,) + ord_sh)[0]
            r_ = jax.lax.dynamic_slice(rg, (g, 0), (1,) + rng_sh)[0]
            color, _ = rasterize_blend(
                RasterPrep(t_, o_, r_, None), bg + a * 1e-30, size, size,
                st, channels_first=False)
            return a + jnp.sum(color[:, :, :1])
        return jax.lax.fori_loop(0, G, blend_g, acc)

    def prep_fori(base, acc):
        tbl0 = jnp.zeros((G,) + tbl_sh, shapes.table.dtype)
        ord0 = jnp.zeros((G,) + ord_sh, jnp.int32)
        rng0 = jnp.zeros((G,) + rng_sh, jnp.int32)

        def prep_g(g, carry):
            tbl, od, rg = carry
            p = prep(acc + base + jnp.float32(g))
            return (jax.lax.dynamic_update_slice(tbl, p.table[None],
                                                 (g, 0, 0)),
                    jax.lax.dynamic_update_slice(od, p.order[None], (g, 0)),
                    jax.lax.dynamic_update_slice(rg, p.ranges[None],
                                                 (g, 0)))
        return jax.lax.fori_loop(0, G, prep_g, (tbl0, ord0, rng0))

    def prep_vmap(base, acc):
        ps = acc + base + jnp.arange(G, dtype=jnp.float32)
        p = jax.vmap(prep)(ps)
        return p.table, p.order, p.ranges

    def make(variant):
        prestacked = None
        if variant == "blendonly":
            pf = jax.jit(lambda: prep_vmap(jnp.float32(0), jnp.float32(0)))
            prestacked = jax.block_until_ready(pf())

        def run(_):
            def gbody(gi, acc):
                base = jnp.float32(gi * G)
                if variant == "two":
                    tbl, od, rg = prep_fori(base, acc * 1e-30)
                    return blend_sum(tbl, od, rg, acc)
                if variant == "vprep":
                    tbl, od, rg = prep_vmap(base, acc * 1e-30)
                    return blend_sum(tbl, od, rg, acc)
                if variant == "preponly":
                    tbl, od, rg = prep_fori(base, acc * 1e-30)
                    return (acc + jnp.float32(jnp.sum(rg)) * 1e-12
                            + jnp.sum(tbl[:, 0, :8]) * 1e-12)
                if variant == "vpreponly":
                    tbl, od, rg = prep_vmap(base, acc * 1e-30)
                    return (acc + jnp.float32(jnp.sum(rg)) * 1e-12
                            + jnp.sum(tbl[:, 0, :8]) * 1e-12)
                tbl, od, rg = prestacked
                return blend_sum(tbl, od, rg + (acc * 1e-30).astype(
                    jnp.int32), acc)
            return jax.lax.fori_loop(0, iters // G, gbody, jnp.float32(0))
        return jax.jit(run)

    for variant in args.variants.split(","):
        fn = make(variant)
        tc = time.time()
        v = jax.block_until_ready(fn(0))
        tc = time.time() - tc
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(fn(0))
            reps.append((time.time() - ts) / iters * 1e3)
        print(f"[grp] {variant}: {min(reps):.2f} ms/frame "
              f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
              f"acc={float(v):.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
