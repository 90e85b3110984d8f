"""On-chip early-exit probe for the forward blend (the frame's biggest
stage, ~31 ms of the ~49 ms exact frame).

The CPU simulation of the canonical bench scene says the all-pixels-
saturated exit should stop after 18.6% of chunk steps (2,719 of 14,582 at
tile 32 / chunk 32), i.e. only ~87k of 462k instance-row DMAs are needed —
yet the measured on-chip blend time matches the FULL list at the
~60 ns/row descriptor floor. This probe settles where the time goes:

  * counts: run the instrumented kernel (ops/gsplat.py:blend_probe) once
    and report chunks-run vs chunks-total — ground truth for whether the
    exit fires on-chip at all.
  * timing: A/B exit_every in {1, 0, 4, 8} x chunk in {32, 64} with the
    in-jit loop pattern (block_until_ready does not sync through the axon
    tunnel; a data dependency + scalar fetch does, see bench.py).

Run (owns the TPU — serialize with other jobs):
    python tools/ee_probe.py 2>&1 | tee outputs/bench/<window>/ee_probe.log
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="1:32,0:32,4:32,8:32,1:64,4:64",
                    help="comma list of exit_every:chunk")
    ap.add_argument("--skip-counts", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="also time prep (project+bin+pack) and rasterize")
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform
    pin_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.benchscene import make_bench_scene, frame0_gaussians
    from guava_renderer_tpu.ops.gsplat import (
        _CCH, _GEOM, _PK, ALPHA_MIN, NUM_CHANNELS, RasterizeSettings,
        bin_gaussians, blend_probe, blend_tiles)
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    t0 = time.time()
    sc = make_bench_scene()
    gs = frame0_gaussians(sc)
    print(f"[ee] scene {time.time()-t0:.0f}s", flush=True)

    st = RasterizeSettings(
        tile=32, chunk=32, max_tiles_per_gaussian=2,
        size_classes=tuple(tuple(p) for p in
                           ((256, 256), (3840, 64), (28672, 16), (32768, 4))),
        presort=True, tile_cull=True)

    @jax.jit
    def prep(xyz, colors, opac, scales, rots):
        proj = project_gaussians(xyz, scales, rots, opac, sc.cam, 1.0, False)
        contributing = proj.valid & (proj.alpha >= ALPHA_MIN)
        ranges, order, nv, ntr = bin_gaussians(
            proj.mean2d, proj.depth, proj.radius_bin, contributing,
            sc.size, sc.size, st, conic=proj.conic, alpha=proj.alpha)
        P = xyz.shape[0]
        invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
        table = jnp.concatenate(
            [proj.mean2d, proj.conic, proj.alpha[:, None],
             jnp.zeros((P, 2), jnp.float32), colors, invd[:, None],
             jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32)],
            axis=-1)
        return ranges, order, table, nv, ntr

    ranges, order, table, nv, ntr = jax.block_until_ready(prep(
        gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
        gs.rotation[0]))
    print(f"[ee] binned: instances={int(nv)} truncated={int(ntr)} "
          f"({time.time()-t0:.0f}s)", flush=True)
    bg = jnp.zeros(_CCH)

    def padded(order_, chunk):
        G = chunk
        pad = ((order_.shape[0] + G - 1) // G + 1) * G - order_.shape[0]
        return jnp.concatenate([order_, jnp.zeros((pad,), order_.dtype)])

    if not args.skip_counts:
        for ee in (1, 4):
            f = jax.jit(lambda t_, o_, r_, ee=ee: blend_probe(
                t_, o_, r_, bg, sc.size, sc.size, 32, 32, 1, ee))
            out, tt, cnt = jax.block_until_ready(
                f(table, padded(order, 32), ranges))
            cnt = np.asarray(cnt)[:, :, 0, 0]
            r = np.asarray(ranges)
            nch = np.ceil((r[1:] - r[:-1]) / 32).astype(np.int64)
            print(f"[ee] counts exit_every={ee}: run={int(cnt.sum())} "
                  f"of {int(nch.sum())} "
                  f"({cnt.sum()/max(nch.sum(),1):.1%}) "
                  f"checksum={float(np.asarray(out).sum()):.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    if args.stages:
        from guava_renderer_tpu.ops.gsplat import rasterize

        def prep_loop(xyz, colors, opac, scales, rots):
            def body(i, acc):
                r_, o_, t_, nv_, _ = prep(xyz + acc * 0.0, colors, opac,
                                          scales, rots)
                return acc + t_[0, 0] * 0.0 + jnp.float32(nv_)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        f = jax.jit(prep_loop)
        a = (gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
             gs.rotation[0])
        v = jax.block_until_ready(f(*a))
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(f(*a))
            reps.append((time.time() - ts) / args.iters * 1e3)
        print(f"[ee] prep(project+bin+pack): {min(reps):.2f} ms/frame "
              f"(reps {[f'{x:.2f}' for x in reps]})", flush=True)

        def full_loop(xyz, colors, opac, scales, rots):
            def body(i, acc):
                c, r, iv = rasterize(xyz + acc * 0.0, colors, opac, scales,
                                     rots, sc.cam,
                                     jnp.zeros(NUM_CHANNELS), st,
                                     channels_first=False)
                return acc + c[0, 0, 0] * 0.0 + jnp.sum(c[0, 0])
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        f = jax.jit(full_loop)
        v = jax.block_until_ready(f(*a))
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(f(*a))
            reps.append((time.time() - ts) / args.iters * 1e3)
        print(f"[ee] rasterize full: {min(reps):.2f} ms/frame "
              f"(reps {[f'{x:.2f}' for x in reps]})", flush=True)

    for spec in args.variants.split(","):
        ee, ch = (int(x) for x in spec.split(":"))
        op = padded(order, ch)

        def run(t_, o_, r_, ee=ee, ch=ch):
            def body(i, carry):
                acc, b = carry
                out, tt = blend_tiles(t_, o_, r_, b, sc.size, sc.size,
                                      32, ch, 1, ee)
                s = out[0, 0, 0, 0] * 0.0
                return acc + jnp.sum(out[:, :, 0, :1]), bg + s
            acc, _ = jax.lax.fori_loop(0, args.iters, body,
                                       (jnp.float32(0), bg))
            return acc
        f = jax.jit(run)
        tc = time.time()
        v = jax.block_until_ready(f(table, op, ranges))
        tc = time.time() - tc
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(f(table, op, ranges))
            reps.append((time.time() - ts) / args.iters * 1e3)
        print(f"[ee] blend exit_every={ee} chunk={ch}: "
              f"{min(reps):.2f} ms/frame (reps {[f'{x:.2f}' for x in reps]}, "
              f"compile+first {tc:.0f}s, acc={float(v):.1f})", flush=True)


if __name__ == "__main__":
    main()
