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
    ap.add_argument("--stages3", action="store_true",
                    help="composed-cost experiments (blend-in-context)")
    ap.add_argument("--stages4", action="store_true",
                    help="discriminate DCE-lied-prep vs blend-slowed-in-"
                         "context (see stage comments)")
    ap.add_argument("--stages5", action="store_true",
                    help="isolate the (P,128) table materialization cost "
                         "and candidate constructions")
    ap.add_argument("--stages6", action="store_true",
                    help="grouped two-phase frames (prep xG then blend xG "
                         "inside one body) — tests whether separating the "
                         "phases recovers the twoloop additivity")
    ap.add_argument("--stages7", action="store_true",
                    help="prep_full decomposition: project / rank-sort / "
                         "gather / duplicate / instance-sort / ranges, "
                         "each fully consumed — attributes the ~21 ms "
                         "prep cost to its sub-stages")
    ap.add_argument("--ladder", default="",
                    help="override the probe's size-class ladder "
                         "('count:cap,...')")
    ap.add_argument("--cache", action="store_true",
                    help="cache the deformed frame-0 gaussians in /tmp")
    ap.add_argument("--priority-window", type=int, default=16,
                    help="RasterizeSettings.priority_window for the probe")
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
    cache = "/tmp/ee_scene_cache.npz"
    if args.cache and os.path.exists(cache):
        z = np.load(cache)
        from guava_renderer_tpu.core.cameras import Camera

        class _GS:
            xyz = jnp.asarray(z["xyz"])[None]
            colors = jnp.asarray(z["colors"])[None]
            opacity = jnp.asarray(z["opacity"])[None]
            scaling = jnp.asarray(z["scaling"])[None]
            rotation = jnp.asarray(z["rotation"])[None]

        class _SC:
            size = int(z["size"])
            cam = Camera(R=jnp.asarray(z["R"]), t=jnp.asarray(z["t"]),
                         tanfovx=jnp.asarray(z["tanfovx"]),
                         tanfovy=jnp.asarray(z["tanfovy"]),
                         width=int(z["size"]), height=int(z["size"]))

        gs, sc = _GS, _SC
        print(f"[ee] scene (cached) {time.time()-t0:.0f}s", flush=True)
    else:
        sc_ = make_bench_scene()
        gs = frame0_gaussians(sc_)
        sc = sc_
        if args.cache:
            np.savez(cache, xyz=np.asarray(gs.xyz[0]),
                     colors=np.asarray(gs.colors[0]),
                     opacity=np.asarray(gs.opacity[0]),
                     scaling=np.asarray(gs.scaling[0]),
                     rotation=np.asarray(gs.rotation[0]),
                     R=np.asarray(sc_.cam.R), t=np.asarray(sc_.cam.t),
                     tanfovx=np.asarray(sc_.cam.tanfovx),
                     tanfovy=np.asarray(sc_.cam.tanfovy), size=sc_.size)
        print(f"[ee] scene {time.time()-t0:.0f}s", flush=True)

    ladder = ((256, 256), (3840, 64), (28672, 16), (32768, 4))
    if args.ladder:
        ladder = tuple(tuple(int(v) for v in pair.split(":"))
                       for pair in args.ladder.split(",") if pair)
    st = RasterizeSettings(
        tile=32, chunk=32, max_tiles_per_gaussian=2,
        size_classes=tuple(tuple(p) for p in ladder),
        presort=True, tile_cull=True,
        priority_window=args.priority_window)
    print(f"[ee] ladder={ladder} pw={args.priority_window}", flush=True)

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
                r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
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

        # prep with the instance sort CONSUMED (the plain prep loop only
        # reads table[0,0]+num_valid, so XLA dead-code-eliminates the big
        # static-row sort entirely — prep_sorted minus prep = sort cost)
        def prep_sorted_loop(xyz, colors, opac, scales, rots):
            def body(i, acc):
                r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                          scales, rots)
                return (acc + t_[0, 0] * 0.0 + jnp.float32(nv_)
                        + jnp.float32(jnp.sum(r_)) + jnp.float32(o_[0]))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        f = jax.jit(prep_sorted_loop)
        v = jax.block_until_ready(f(*a))
        reps = []
        for _ in range(3):
            ts = time.time()
            v = jax.block_until_ready(f(*a))
            reps.append((time.time() - ts) / args.iters * 1e3)
        print(f"[ee] prep+sort consumed: {min(reps):.2f} ms/frame "
              f"(reps {[f'{x:.2f}' for x in reps]})", flush=True)

        # prep + blend composed (everything in rasterize except the final
        # tiled->image relayout and the radius/invdepth outputs)
        from guava_renderer_tpu.ops.gsplat import _tiled_to_image

        def composed_loop(relayout):
            def run(xyz, colors, opac, scales, rots):
                def body(i, acc):
                    r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                              scales, rots)
                    G = 32
                    pad = ((o_.shape[0] + G - 1) // G + 1) * G - o_.shape[0]
                    o_ = jnp.concatenate([o_, jnp.zeros((pad,), o_.dtype)])
                    out, tt = blend_tiles(t_, o_, r_, bg, sc.size, sc.size,
                                          32, 32, 1, 1)
                    if relayout:
                        img = _tiled_to_image(out, sc.size, sc.size, 32)
                        return acc + img[0, 0, 0] * 0.0 + jnp.sum(img[:, :, 0])
                    return acc + out[0, 0, 0, 0] * 0.0 + jnp.sum(
                        out[:, :, 0, :1])
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
            return run

        for relayout in (False, True):
            f = jax.jit(composed_loop(relayout))
            v = jax.block_until_ready(f(*a))
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(f(*a))
                reps.append((time.time() - ts) / args.iters * 1e3)
            tag = "composed+img" if relayout else "composed"
            print(f"[ee] {tag} (prep+blend{'+relayout' if relayout else ''}): "
                  f"{min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]})", flush=True)

        def full_loop(xyz, colors, opac, scales, rots):
            def body(i, acc):
                c, r, iv = rasterize(xyz + acc * 1e-30, colors, opac, scales,
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

    if args.stages3:
        # Discriminate WHY blend-in-context costs ~15 ms when the
        # standalone blend (same data, inputs as jit arguments) is 4.5:
        #   hoisted  — prep loop-invariant, blend per-iteration: isolates
        #              "blend reading XLA-produced buffers" from
        #              per-iteration prep cost.
        #   argblend — per-iteration prep (outputs consumed) + blend on
        #              the ARGUMENT table/order/ranges: prep+blend with no
        #              producer->consumer edge. Expect prep_sorted + 4.5.
        #   barrier  — composed with optimization_barrier between prep
        #              outputs and blend inputs (blocks producer fusions).
        from guava_renderer_tpu.ops.gsplat import _tiled_to_image  # noqa

        op32 = padded(order, 32)

        def timeit(name, f, *fargs):
            tc = time.time()
            v = jax.block_until_ready(f(*fargs))
            tc = time.time() - tc
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(f(*fargs))
                reps.append((time.time() - ts) / args.iters * 1e3)
            print(f"[ee] {name}: {min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
                  f"acc={float(v):.1f})", flush=True)

        def hoisted(xyz, colors, opac, scales, rots):
            r_, o_, t_, nv_, _ = prep(xyz, colors, opac, scales, rots)
            G = 32
            pad = ((o_.shape[0] + G - 1) // G + 1) * G - o_.shape[0]
            o_ = jnp.concatenate([o_, jnp.zeros((pad,), o_.dtype)])

            def body(i, carry):
                acc, b = carry
                out, tt = blend_tiles(t_, o_, r_, b, sc.size, sc.size,
                                      32, 32, 1, 1)
                s = out[0, 0, 0, 0] * 0.0
                return acc + jnp.sum(out[:, :, 0, :1]), bg + s
            acc, _ = jax.lax.fori_loop(0, args.iters, body,
                                       (jnp.float32(0), bg))
            return acc
        timeit("hoisted (prep once, blend xN)", jax.jit(hoisted),
               gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
               gs.rotation[0])

        def argblend(xyz, colors, opac, scales, rots, t_, o_, r_):
            def body(i, acc):
                rr, oo, tt_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                           scales, rots)
                out, _tt = blend_tiles(t_, o_, r_, bg + acc * 1e-30, sc.size,
                                       sc.size, 32, 32, 1, 1)
                return (acc + jnp.sum(out[:, :, 0, :1]) * 1e-9
                        + tt_[0, 0] * 0.0 + jnp.float32(nv_)
                        + jnp.float32(jnp.sum(rr)) + jnp.float32(oo[0]))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit("argblend (prep xN + blend-on-args xN)", jax.jit(argblend),
               gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
               gs.rotation[0], table, op32, ranges)

        def barrier(xyz, colors, opac, scales, rots):
            def body(i, acc):
                r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                          scales, rots)
                G = 32
                pad = ((o_.shape[0] + G - 1) // G + 1) * G - o_.shape[0]
                o_ = jnp.concatenate([o_, jnp.zeros((pad,), o_.dtype)])
                t_, o_, r_ = jax.lax.optimization_barrier((t_, o_, r_))
                out, tt = blend_tiles(t_, o_, r_, bg, sc.size, sc.size,
                                      32, 32, 1, 1)
                return acc + out[0, 0, 0, 0] * 0.0 + jnp.sum(
                    out[:, :, 0, :1])
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit("barrier (composed + opt-barrier)", jax.jit(barrier),
               gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
               gs.rotation[0])

    if args.stages4:
        # The stages3 numbers left an ambiguity: composed (28 ms) exceeds
        # prep_sorted (12.7) + standalone blend (4.6) by ~11 ms. Either
        #   (a) prep_sorted was partially DCE'd (it consumed only
        #       table[0,0] + sum(ranges) + order[0], so XLA could prune
        #       whole sort payload operands / table columns), or
        #   (b) the blend kernel itself runs slower in a program that also
        #       contains prep (e.g. the early exit not firing in context).
        # Four discriminators:
        #   prep_full      — prep with EVERY output fully consumed
        #                    (sum(table), sum(order), sum(ranges), nv):
        #                    the true prep cost, no DCE escape hatch.
        #   composed ee0   — composed loop, exit_every=0. If this matches
        #                    the ee1 composed time, the early exit buys
        #                    nothing in context (supports (b)); if it is
        #                    ~14 ms slower (the standalone ee0-ee1 delta),
        #                    the exit works and (a) holds.
        #   twoloop        — ONE jit: loop A (prep_full xN) then loop B
        #                    (blend xN on args). Additivity check with
        #                    zero producer->consumer edges.
        #   ccounts        — blend_probe composed after prep in one jit:
        #                    ground-truth chunks-run in context.
        op32 = padded(order, 32)

        def timeit4(name, f, *fargs):
            tc = time.time()
            v = jax.block_until_ready(f(*fargs))
            tc = time.time() - tc
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(f(*fargs))
                reps.append((time.time() - ts) / args.iters * 1e3)
            print(f"[ee] {name}: {min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
                  f"acc={float(v):.1f})", flush=True)

        def prep_full(xyz, colors, opac, scales, rots):
            def body(i, acc):
                r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                          scales, rots)
                return (acc + jnp.sum(t_) * 1e-9 + jnp.float32(nv_)
                        + jnp.float32(jnp.sum(r_)) * 1e-6
                        + jnp.float32(jnp.sum(o_)) * 1e-9)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit4("prep_full (all outputs consumed)", jax.jit(prep_full),
                gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
                gs.rotation[0])

        def composed_ee(ee):
            def run(xyz, colors, opac, scales, rots):
                def body(i, acc):
                    r_, o_, t_, nv_, _ = prep(xyz + acc * 1e-30, colors,
                                              opac, scales, rots)
                    G = 32
                    pad = ((o_.shape[0] + G - 1) // G + 1) * G - o_.shape[0]
                    o_ = jnp.concatenate([o_, jnp.zeros((pad,), o_.dtype)])
                    out, tt = blend_tiles(t_, o_, r_, bg, sc.size, sc.size,
                                          32, 32, 1, ee)
                    return acc + out[0, 0, 0, 0] * 0.0 + jnp.sum(
                        out[:, :, 0, :1])
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
            return run
        for ee in (1, 0):
            timeit4(f"composed ee={ee}", jax.jit(composed_ee(ee)),
                    gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
                    gs.rotation[0])

        def twoloop(xyz, colors, opac, scales, rots, t_, o_, r_):
            def bodyA(i, acc):
                rr, oo, tt_, nv_, _ = prep(xyz + acc * 1e-30, colors, opac,
                                           scales, rots)
                return (acc + jnp.sum(tt_) * 1e-9 + jnp.float32(nv_)
                        + jnp.float32(jnp.sum(rr)) * 1e-6
                        + jnp.float32(jnp.sum(oo)) * 1e-9)
            accA = jax.lax.fori_loop(0, args.iters, bodyA, jnp.float32(0))

            def bodyB(i, carry):
                acc, b = carry
                out, tt = blend_tiles(t_, o_, r_, b, sc.size, sc.size,
                                      32, 32, 1, 1)
                s = out[0, 0, 0, 0] * 0.0
                return acc + jnp.sum(out[:, :, 0, :1]), bg + s
            accB, _ = jax.lax.fori_loop(
                0, args.iters, bodyB, (accA * 1e-9, bg + accA * 0.0))
            return accB
        timeit4("twoloop (prep_full xN; then blend xN)", jax.jit(twoloop),
                gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
                gs.rotation[0], table, op32, ranges)

        @jax.jit
        def ccounts(xyz, colors, opac, scales, rots):
            r_, o_, t_, nv_, _ = prep(xyz, colors, opac, scales, rots)
            G = 32
            pad = ((o_.shape[0] + G - 1) // G + 1) * G - o_.shape[0]
            o_ = jnp.concatenate([o_, jnp.zeros((pad,), o_.dtype)])
            out, tt, cnt = blend_probe(t_, o_, r_, bg, sc.size, sc.size,
                                       32, 32, 1, 1)
            return out, r_, cnt
        out, r_, cnt = jax.block_until_ready(ccounts(
            gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
            gs.rotation[0]))
        cnt = np.asarray(cnt)[:, :, 0, 0]
        r = np.asarray(r_)
        nch = np.ceil((r[1:] - r[:-1]) / 32).astype(np.int64)
        print(f"[ee] composed counts: run={int(cnt.sum())} "
              f"of {int(nch.sum())} ({cnt.sum()/max(nch.sum(),1):.1%}) "
              f"checksum={float(np.asarray(out).sum()):.1f}", flush=True)

    if args.stages5:
        # stages4 verdict: prep_full=20.9 ms, twoloop additive, composed
        # +7.7 ms over additive, and a mere optimization_barrier COPY of
        # the prep outputs cost +4.9 ms (stages3) — ~20x a bandwidth-bound
        # (P,128) copy. Suspect: XLA materializes/relayouts the minor-dim
        # concat table pathologically. Measure constructions in isolation
        # (all on ARG pieces, consumed via barrier + [0,0] probe):
        P = gs.xyz[0].shape[0]
        cols = {
            "m2": jnp.asarray(table[:, 0]),
            "cy": jnp.asarray(table[:, 1]),
            "ca": jnp.asarray(table[:, 2]),
            "cb": jnp.asarray(table[:, 3]),
            "cc": jnp.asarray(table[:, 4]),
            "al": jnp.asarray(table[:, 5]),
            "iv": jnp.asarray(table[:, _GEOM + NUM_CHANNELS]),
        }
        colors32 = jnp.asarray(table[:, _GEOM:_GEOM + NUM_CHANNELS])

        def timeit5(name, f, *fargs):
            tc = time.time()
            v = jax.block_until_ready(f(*fargs))
            tc = time.time() - tc
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(f(*fargs))
                reps.append((time.time() - ts) / args.iters * 1e3)
            print(f"[ee] {name}: {min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
                  f"acc={float(v):.1f})", flush=True)

        def concat_loop(mx, cy, ca, cb, cc, al, colors_, iv):
            def body(i, acc):
                z2 = jnp.zeros((P, 2), jnp.float32)
                tail = jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1),
                                 jnp.float32)
                t_ = jnp.concatenate(
                    [jnp.stack([mx + acc * 1e-30, cy, ca, cb, cc, al],
                               axis=1), z2, colors_, iv[:, None], tail],
                    axis=-1)
                t_ = jax.lax.optimization_barrier(t_)
                return acc + t_[0, 0] + t_[12345, 50] * 1e-6
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit5("concat+barrier (table materialization)",
                jax.jit(concat_loop), cols["m2"], cols["cy"], cols["ca"],
                cols["cb"], cols["cc"], cols["al"], colors32, cols["iv"])

        def pad_table_loop(colors_, mx):
            # colors-as-base: pad the WIDE contiguous piece and overwrite
            # the narrow lanes via dynamic_update_slice
            def body(i, acc):
                t_ = jnp.pad(colors_, ((0, 0), (_GEOM, _PK - _GEOM
                                                - NUM_CHANNELS)))
                t_ = jax.lax.dynamic_update_slice(
                    t_, (mx + acc * 1e-30)[:, None], (0, 0))
                t_ = jax.lax.optimization_barrier(t_)
                return acc + t_[0, 0] + t_[12345, 50] * 1e-6
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit5("pad+dus (colors-base table)", jax.jit(pad_table_loop),
                colors32, cols["m2"])

        def copy_loop(t_in):
            def body(i, acc):
                t_ = jax.lax.optimization_barrier(t_in + acc * 1e-30)
                return acc + t_[0, 0] + t_[12345, 50] * 1e-6
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit5("plain (P,128) copy+barrier", jax.jit(copy_loop), table)

        def order_loop(o_flat):
            def body(i, acc):
                o_ = jnp.concatenate([o_flat + (acc * 0).astype(jnp.int32),
                                      jnp.zeros((32,), o_flat.dtype)])
                o2 = jax.lax.optimization_barrier(o_)
                return acc + jnp.float32(o2[0]) + jnp.float32(o2[12345])
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        timeit5("order pad+barrier", jax.jit(order_loop), order)

    if args.stages6:
        # stages3/4: blend interleaved with prep in one loop body costs
        # ~12.5 ms vs 4.7 standalone, while SEPARATE loops (twoloop) are
        # additive. If a grouped two-phase structure (prep xG into stacked
        # HBM buffers, then blend xG) recovers additivity, the real frame
        # loop can adopt it (G=2 doubles table memory: ~190 MB, fine).
        G_pad = 32
        op_len = ((order.shape[0] + G_pad - 1) // G_pad + 1) * G_pad
        P_rows = table.shape[0]

        def grouped(group):
            def run(xyz, colors, opac, scales, rots):
                tbl0 = jnp.zeros((group, P_rows, _PK), jnp.float32)
                ord0 = jnp.zeros((group, op_len), jnp.int32)
                rng0 = jnp.zeros((group, ranges.shape[0]), jnp.int32)

                def body(i, acc):
                    def prep_g(g, carry):
                        tbl, od, rg = carry
                        r_, o_, t_, nv_, _ = prep(
                            xyz + (acc + g.astype(jnp.float32))
                            * 1e-30, colors, opac, scales, rots)
                        o_ = jnp.concatenate(
                            [o_, jnp.zeros((op_len - o_.shape[0],),
                                           o_.dtype)])
                        tbl = jax.lax.dynamic_update_slice(
                            tbl, t_[None], (g, 0, 0))
                        od = jax.lax.dynamic_update_slice(
                            od, o_[None], (g, 0))
                        rg = jax.lax.dynamic_update_slice(
                            rg, r_[None], (g, 0))
                        return tbl, od, rg
                    tbl, od, rg = jax.lax.fori_loop(
                        0, group, prep_g, (tbl0, ord0, rng0))

                    def blend_g(g, a):
                        t_ = jax.lax.dynamic_slice(
                            tbl, (g, 0, 0), (1, P_rows, _PK))[0]
                        o_ = jax.lax.dynamic_slice(
                            od, (g, 0), (1, op_len))[0]
                        r_ = jax.lax.dynamic_slice(
                            rg, (g, 0), (1, ranges.shape[0]))[0]
                        out, tt = blend_tiles(t_, o_, r_, bg + a * 1e-30,
                                              sc.size, sc.size, 32, 32,
                                              1, 1)
                        return a + jnp.sum(out[:, :, 0, :1])
                    return jax.lax.fori_loop(0, group, blend_g, acc)
                n_groups = max(args.iters // group, 1)
                return jax.lax.fori_loop(0, n_groups, body, jnp.float32(0))
            return run, max(args.iters // group, 1) * group

        for group in (1, 2, 4):
            f, nfr = grouped(group)
            jf = jax.jit(f)
            a = (gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
                 gs.rotation[0])
            tc = time.time()
            v = jax.block_until_ready(jf(*a))
            tc = time.time() - tc
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(jf(*a))
                reps.append((time.time() - ts) / nfr * 1e3)
            print(f"[ee] grouped G={group}: {min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
                  f"acc={float(v):.1f})", flush=True)

    if args.stages7:
        # Incremental prep decomposition, mirroring _bin_nopresort's
        # size_classes path (ops/gsplat.py:477-555) stage by stage, every
        # stage's outputs consumed into the loop carry so XLA cannot DCE
        # them. stage k minus stage k-1 = that sub-stage's marginal cost.
        from guava_renderer_tpu.ops.gsplat import (
            _cull_qcut, _dup_tiles, _pack_sort_key, _unpack_sort_tile)
        from guava_renderer_tpu.ops.gsplat_project import tile_rect

        tile_px = st.tile
        gx7 = sc.size // tile_px
        num_tiles7 = gx7 * gx7
        P7 = int(gs.xyz.shape[1])
        tpg7 = st.max_tiles_per_gaussian
        id_bits = max(1, int(P7 - 1).bit_length())

        def stage_fn(upto):
            def f(xyz, colors, opac, scales, rots):
                def body(i, acc):
                    proj = project_gaussians(
                        xyz + acc * 1e-30, scales, rots, opac, sc.cam,
                        1.0, False)
                    valid = proj.valid & (proj.alpha >= ALPHA_MIN)
                    x0, y0, x1, y1 = tile_rect(
                        proj.mean2d, proj.radius_bin, sc.size, sc.size,
                        tile_px)
                    rw = x1 - x0
                    rh = y1 - y0
                    valid = valid & (rw > 0) & (rh > 0)
                    acc = acc + jnp.float32(
                        jnp.sum(jnp.where(valid, rw * rh, 0))) * 1e-9
                    if upto == 0:       # project + rects
                        return acc
                    depth_bits = jax.lax.bitcast_convert_type(
                        proj.depth, jnp.int32)
                    need = jnp.where(valid, rw * rh, -1)
                    packed_need = ((need + 1) << id_bits) | jnp.arange(
                        P7, dtype=jnp.int32)
                    ranked = jax.lax.sort(packed_need)[::-1] & (
                        (1 << id_bits) - 1)
                    if upto == 1:       # + area-rank sort
                        return acc + jnp.float32(
                            jnp.sum(ranked)) * 1e-12
                    rg = lambda a: a[ranked]  # noqa: E731
                    x0r, y0r, rwr, rhr = rg(x0), rg(y0), rg(rw), rg(rh)
                    validr = rg(valid)
                    dkr = rg(depth_bits)
                    qcut = _cull_qcut(proj.conic, proj.alpha)
                    cpr = tuple(rg(a) for a in (
                        proj.mean2d[:, 0], proj.mean2d[:, 1],
                        proj.conic[:, 0], proj.conic[:, 1],
                        proj.conic[:, 2], qcut))
                    if upto == 2:       # + rank gathers
                        return (acc + jnp.float32(jnp.sum(x0r + y0r)) * 1e-9
                                + jnp.sum(cpr[0]) * 1e-9
                                + jnp.float32(jnp.sum(dkr)) * 1e-12)
                    parts_t, parts_g, parts_d = [], [], []
                    start = 0
                    for count, cap in st.size_classes:
                        count = min(int(count), P7 - start)
                        if count <= 0:
                            break
                        s = slice(start, start + count)
                        tid = _dup_tiles(
                            x0r[s], y0r[s], rwr[s], rhr[s], validr[s],
                            int(cap), tuple(a[s] for a in cpr), tile_px,
                            gx7, num_tiles7, st.priority_window)
                        parts_t.append(tid.reshape(-1))
                        parts_g.append(jnp.broadcast_to(
                            ranked[s][:, None], (count, int(cap))
                        ).reshape(-1))
                        parts_d.append(jnp.broadcast_to(
                            dkr[s][:, None], (count, int(cap))
                        ).reshape(-1))
                        start += count
                    s = slice(start, P7)
                    n_base = P7 - start
                    tid = _dup_tiles(
                        x0r[s], y0r[s], rwr[s], rhr[s], validr[s], tpg7,
                        tuple(a[s] for a in cpr), tile_px, gx7,
                        num_tiles7, st.priority_window)
                    parts_t.append(tid.reshape(-1))
                    parts_g.append(jnp.broadcast_to(
                        ranked[s][:, None], (n_base, tpg7)).reshape(-1))
                    parts_d.append(jnp.broadcast_to(
                        dkr[s][:, None], (n_base, tpg7)).reshape(-1))
                    tile_flat = jnp.concatenate(parts_t)
                    gid_flat = jnp.concatenate(parts_g)
                    dk_flat = jnp.concatenate(parts_d)
                    if upto == 3:       # + duplication (tiles+gids+depths)
                        return (acc + jnp.float32(
                            jnp.sum(tile_flat)) * 1e-12
                            + jnp.float32(jnp.sum(gid_flat)) * 1e-12
                            + jnp.float32(jnp.sum(dk_flat)) * 1e-15)
                    key, nkeys = _pack_sort_key(
                        tile_flat, dk_flat, num_tiles7)
                    out = jax.lax.sort((*key, gid_flat), num_keys=nkeys)
                    if upto == 4:       # + instance sort
                        return (acc + jnp.float32(
                            jnp.sum(out[nkeys])) * 1e-12
                            + jnp.float32(jnp.sum(out[0])) * 1e-15)
                    sorted_tile = _unpack_sort_tile(
                        out[:nkeys], num_tiles7)
                    ranges_ = jnp.searchsorted(
                        sorted_tile,
                        jnp.arange(num_tiles7 + 1, dtype=jnp.int32),
                        method="scan").astype(jnp.int32)
                    return (acc + jnp.float32(jnp.sum(ranges_)) * 1e-9
                            + jnp.float32(jnp.sum(out[nkeys])) * 1e-12)
                return jax.lax.fori_loop(0, args.iters, body,
                                         jnp.float32(0))
            return f

        names7 = ("project+rects", "+rank sort", "+rank gathers",
                  "+duplicate", "+instance sort", "+ranges")
        a7 = (gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
              gs.rotation[0])
        for upto, name in enumerate(names7):
            jf = jax.jit(stage_fn(upto))
            tc = time.time()
            v = jax.block_until_ready(jf(*a7))
            tc = time.time() - tc
            reps = []
            for _ in range(3):
                ts = time.time()
                v = jax.block_until_ready(jf(*a7))
                reps.append((time.time() - ts) / args.iters * 1e3)
            print(f"[ee] stage7[{upto}] {name}: {min(reps):.2f} ms/frame "
                  f"(reps {[f'{x:.2f}' for x in reps]}, compile {tc:.0f}s, "
                  f"acc={float(v):.1f})", flush=True)

    for spec in args.variants.split(","):
        if not spec:
            continue
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
