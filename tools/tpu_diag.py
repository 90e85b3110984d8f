"""On-chip failure triage for the round-2 window findings.

Round-2 window evidence (outputs/bench/tpu_window_20260816_195357):
  1. CROSSCHECK FAIL: compiled blend kernel color differs from the committed
     golden/interpret render by 1.4e-2 max (radii exact, so projection and
     binning agree — the diff is inside or after the Pallas blend).
  2. The 512^2 parity bench burns ~850 s then dies with `TPU backend error
     (Internal)` — and the failure WEDGES the in-process TPU client (every
     later device_put fails instantly). Small scenes run fine.

Prime suspects for (2): the global `lax.sort` over P*tpg = 2.18M instances
in bin_gaussians, and the (2.18M, 128) f32 packed gather. This script times
each pipeline stage separately at full scale, each stage in its OWN
SUBPROCESS so a wedge can't poison the rest.

    python tools/tpu_diag.py                 # all stages, subprocess each
    python tools/tpu_diag.py --stage golden  # one stage in-process
"""

import argparse
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "raster_scene_v1.npz")

STAGES = [
    "golden",        # compiled vs interpret vs golden, diff maps
    "deform",        # EHM forward + avatar deformation (per-frame pose path)
    "project",       # full-scale projection alone
    "bin",           # binning (the big sort) alone
    "blend",         # Pallas blend w/ fused row-gather (fixed binning inputs)
    "raster1",       # one full rasterize call
    "loop_noref",    # 3-frame loop without refiner
    "refiner",       # refiner-only loop
    "full",          # 3-frame full loop (bench.py shape)
]
# measured r3a: XLA's (2.18M,128) gather = 35.3 s steady — replaced by the
# in-kernel row gather; "gather" stage kept out of the default list
EXTRA_STAGES = ["gather", "refiner2", "refiner3", "bin2", "raster2",
                "quality512", "frame_parts"]


# --------------------------------------------------------------------------
# shared scene builders
# --------------------------------------------------------------------------

def build_scene(size=512, uv=512, body_side=101):
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices
    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.bodymodel import synthetic_ehm
    from guava_renderer_tpu.bodymodel.ehm import (
        BodyParams, EhmModel, FlameParams, ehm_forward,
    )
    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import RasterizeSettings

    smplx, flame_m, extras = synthetic_ehm(
        body_side=body_side, head_side=15, uv_size=uv, n_shape=50, n_exp=20)
    ehm = EhmModel.build(smplx, flame_m, extras)
    faces = jnp.asarray(smplx.faces)
    V = smplx.num_vertices
    N_uv = uv * uv
    rng = np.random.default_rng(0)

    def mk(shape, lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    quats = rng.normal(size=(1, V, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    uv_quats = rng.normal(size=(1, N_uv, 4)).astype(np.float32)
    uv_quats /= np.linalg.norm(uv_quats, axis=-1, keepdims=True)
    avatar = GaussianAvatar(
        vtx_positions=jnp.asarray(smplx.v_template)[None],
        vtx_colors=mk((1, V, 32), 0, 1), vtx_opacity=mk((1, V, 1), 0.3, 0.95),
        vtx_scales=mk((1, V, 3), 0.002, 0.01), vtx_rotations=jnp.asarray(quats),
        uv_local_xyz=mk((1, N_uv, 3), -0.5, 0.5), uv_colors=mk((1, N_uv, 32), 0, 1),
        uv_opacity=mk((1, N_uv, 1), 0.3, 0.95), uv_scales=mk((1, N_uv, 3), 0.05, 0.3),
        uv_rotations=jnp.asarray(uv_quats),
        uv_binding_face=jnp.asarray(extras.uvmap_f_idx.reshape(-1)),
        uv_face_bary=jnp.asarray(extras.uvmap_f_bary.reshape(-1, 3)),
        uv_valid=jnp.asarray(extras.uvmap_mask.reshape(-1)),
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 30.0
    cam = Camera(R=jnp.asarray(w2c[:3, :3]), t=jnp.asarray(w2c[:3, 3]),
                 tanfovx=jnp.asarray(1.0 / 24.0), tanfovy=jnp.asarray(1.0 / 24.0),
                 width=size, height=size)
    settings = RasterizeSettings(tile=32, chunk=32, max_tiles_per_gaussian=2,
                                 large_k=8192, tpg_large=32)
    base_body = BodyParams(shape=jnp.zeros((1, smplx.n_shape)),
                           body_pose=jnp.zeros((1, 21, 3)))
    base_flame = FlameParams(shape=jnp.zeros((1, smplx.n_shape)),
                             exp=jnp.zeros((1, smplx.n_exp)), jaw=jnp.zeros((1, 3)))
    res = ehm_forward(ehm, base_body, base_flame)
    gs = deform_with_vertices(avatar, res.vertices, res.vertex_transforms, faces)
    return dict(ehm=ehm, faces=faces, avatar=avatar, cam=cam, settings=settings,
                base_body=base_body, base_flame=base_flame, gs=gs,
                ehm_forward=ehm_forward, deform=deform_with_vertices, size=size)


def _timeit(label, fn, *args, reps=3, iters=8):
    """Time `fn(*args)` amortized over an in-jit loop with a data
    dependency and a SCALAR fetch.

    The previous one-call-and-fetch version measured the axon tunnel, not
    the chip: every rep paid a full round trip plus the transfer of the
    whole output (np.asarray on a 13 MB blend output dwarfed the compute —
    window 20260817_011351's 372 ms 'project' was RTT+transfer). Looping
    inside jit divides the round trip by `iters` and fetches 4 bytes."""
    import jax
    import jax.numpy as jnp

    fi = next(
        (i for i, a in enumerate(args)
         if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)),
        None,
    )

    def scalarize(out):
        # FULL sums: slicing [:1] lets XLA dead-code-eliminate everything
        # not feeding element 0 of elementwise stages (CPU 'deform'
        # measured 0.0 ms that way); a total reduction forces the whole
        # computation and costs a bandwidth-trivial extra pass
        leaves = [
            x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")
        ]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    @jax.jit
    def run(seed):
        def body(i, acc):
            a = list(args)
            if fi is not None:
                a[fi] = a[fi] + (acc * 1e-30 + i * 0.0).astype(a[fi].dtype)
            return acc + scalarize(fn(*a)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(seed) * 0.0)

    t0 = time.time()
    float(run(0))
    t_compile = time.time() - t0
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.time()
        float(run(r))
        best = min(best, (time.time() - t0) / iters)
    rtt = _rtt_floor(iters)
    print(f"[{label}] compile+first={t_compile:.1f}s steady={best*1000:.1f}ms"
          f" (x{iters} in-jit; minus {rtt*1000:.1f}ms RTT floor ="
          f" {(best-rtt)*1000:.1f}ms)", flush=True)
    return fn(*args)


_RTT_CACHE = {}


def _rtt_floor(iters: int) -> float:
    """Tunnel round-trip per loop iteration: the same fori structure over a
    NO-OP body. Every r8-window stage measured >= 3.4 ms 'steady' — even a
    (B,V) scatter and a 128^2 mean-pool — because one dispatch+fetch through
    the axon tunnel costs ~27 ms and the x8 loop only divides it by 8.
    Subtract this floor or tiny stages read as 3.4 ms."""
    if iters in _RTT_CACHE:
        return _RTT_CACHE[iters]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(seed):
        def body(i, acc):
            return acc + jnp.float32(1e-30) * i
        return jax.lax.fori_loop(0, iters, body, jnp.float32(seed) * 0.0)

    float(run(0))
    best = float("inf")
    for r in range(1, 4):
        t0 = time.time()
        float(run(r))
        best = min(best, (time.time() - t0) / iters)
    _RTT_CACHE[iters] = best
    return best


# --------------------------------------------------------------------------
# stages
# --------------------------------------------------------------------------

def stage_golden(out_dir):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops import gsplat
    from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize

    s = np.load(GOLDEN)
    cam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        tanfovx=jnp.asarray(float(s["tanfov"])),
        tanfovy=jnp.asarray(float(s["tanfov"])),
        width=int(s["size"]), height=int(s["size"]),
    )
    inputs = tuple(
        jnp.asarray(s[k]) for k in ("means", "colors", "opacity", "scales", "quats")
    )
    settings = RasterizeSettings(tile=16, chunk=32, max_tiles_per_gaussian=8)
    fn = jax.jit(lambda *a: rasterize(*a, cam, jnp.asarray(s["bg"]), settings))
    color_c, radii_c, invd_c = map(np.asarray, fn(*inputs))

    gsplat._FORCE_INTERPRET = True
    try:
        color_i, radii_i, invd_i = map(np.asarray, jax.jit(
            lambda *a: rasterize(*a, cam, jnp.asarray(s["bg"]), settings)
        )(*inputs))
    finally:
        gsplat._FORCE_INTERPRET = False

    def report(tag, a, b):
        d = np.abs(np.asarray(a) - np.asarray(b))
        n_bad = int((d > 2e-4).sum())
        line = f"  {tag}: max={d.max():.3e} mean={d.mean():.3e} n>2e-4={n_bad}/{d.size}"
        if d.max() > 0:
            idx = np.unravel_index(np.argmax(d), d.shape)
            line += f" argmax@{idx} a={np.asarray(a)[idx]:.6f} b={np.asarray(b)[idx]:.6f}"
        print(line, flush=True)
        return d

    print("[golden] compiled vs golden:")
    d_cg = report("color", color_c, s["color"])
    report("invd", invd_c, s["invdepth"])
    print("[golden] compiled vs interpret(on-device):")
    report("color", color_c, color_i)
    print("[golden] interpret(on-device) vs golden:")
    report("color", color_i, s["color"])

    size = int(s["size"])
    t = 16
    dmax_img = d_cg.max(axis=0)
    tiles = dmax_img.reshape(size // t, t, size // t, t).max(axis=(1, 3))
    ys, xs = np.nonzero(tiles > 2e-4)
    print(f"[golden] tiles with diff>2e-4: {len(ys)} -> "
          f"{list(zip(ys.tolist(), xs.tolist()))[:12]}", flush=True)
    np.savez_compressed(
        os.path.join(out_dir, "stage_golden_diff.npz"),
        color_compiled=color_c, color_interp=color_i,
        invd_compiled=invd_c, invd_interp=invd_i,
    )


def stage_project(sc):
    import jax

    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    gs, cam, st = sc["gs"], sc["cam"], sc["settings"]
    fn = jax.jit(lambda x, s, q, o: project_gaussians(
        x, s, q, o, cam, st.scale_modifier, st.antialiasing))
    _timeit("project P=272k", fn, gs.xyz[0], gs.scaling[0], gs.rotation[0],
            gs.opacity[0])


def _proj_bin_inputs(sc):
    import jax

    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    gs, cam, st = sc["gs"], sc["cam"], sc["settings"]
    proj = jax.jit(lambda x, s, q, o: project_gaussians(
        x, s, q, o, cam, st.scale_modifier, st.antialiasing))(
        gs.xyz[0], gs.scaling[0], gs.rotation[0], gs.opacity[0])
    import jax.numpy as jnp

    contributing = proj.valid & (proj.alpha.reshape(-1) >= ALPHA_MIN)
    return proj, contributing


def stage_deform(sc):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices

    ehm, avatar, faces = sc["ehm"], sc["avatar"], sc["faces"]
    fwd = sc["ehm_forward"]
    body, flame = sc["base_body"], sc["base_flame"]

    def ehm_only(shape):
        res = fwd(ehm, body._replace(shape=shape), flame)
        return res.vertices, res.vertex_transforms

    _timeit("deform.ehm_forward", jax.jit(ehm_only), body.shape)

    res = jax.jit(ehm_only)(body.shape)
    verts, vtrans = res

    def deform_only(v, t):
        return deform_with_vertices(avatar, v, t, faces)

    _timeit("deform.deform_with_vertices", jax.jit(deform_only), verts, vtrans)

    # ehm sub-parts: bisect the 3.6 ms
    try:
        from guava_renderer_tpu.bodymodel.ehm import flame_branch
        from guava_renderer_tpu.core import lbs as lbs_core

        smplx = ehm.smplx
        B = 1
        model = ehm

        def fb(shape):
            return flame_branch(model, flame._replace(shape=shape), B)

        _timeit("ehm.flame_branch", jax.jit(fb), flame.shape)

        def bs(shape):
            import jax.numpy as jnp
            sc = jnp.concatenate(
                [shape, jnp.zeros((B, model.n_exp))], axis=-1)
            return lbs_core.blend_shapes(sc, smplx["shapedirs"])

        _timeit("ehm.blend_shapes", jax.jit(bs), body.shape)

        template = jnp.asarray(smplx["v_template"])[None] + 0.0
        joints = lbs_core.vertices2joints(smplx["J_regressor"], template)
        rot = jnp.broadcast_to(jnp.eye(3), (B, 55, 3, 3))

        def chain(j):
            return lbs_core.rigid_transform_chain(rot, j, model.smplx_parents)

        _timeit("ehm.rigid_chain", jax.jit(chain), joints)

        _, rel = jax.jit(chain)(joints)

        def skin(r):
            return lbs_core.skinning_transforms(r, smplx["lbs_weights"])

        _timeit("ehm.skinning_transforms", jax.jit(skin), rel)

        hv = jnp.zeros((B, model.smplx2flame_ind.shape[0], 3))

        def graft(t):
            return t.at[:, model.smplx2flame_ind].set(hv)

        _timeit("ehm.graft_scatter (.at[].set 5k rows)", jax.jit(graft),
                template)
    except Exception as e:  # noqa: BLE001
        print(f"[deform] ehm sub-stages FAILED: {str(e)[:300]}", flush=True)

    # planned path: face-sorted UV set + windowed MXU gather (facegather.py)
    try:
        import numpy as np

        from guava_renderer_tpu.avatar.deformer import sort_avatar_by_plan
        from guava_renderer_tpu.ops.facegather import (
            build_face_sort_plan, compact_faces,
        )

        plan = build_face_sort_plan(
            np.asarray(avatar.uv_binding_face), np.asarray(avatar.uv_valid)
        )
        av_np = jax.tree_util.tree_map(np.asarray, avatar)
        av_sorted = jax.tree_util.tree_map(
            jnp.asarray, sort_avatar_by_plan(av_np, plan)
        )
        cfaces = jnp.asarray(compact_faces(plan, np.asarray(faces)))

        def deform_planned(v, t):
            return deform_with_vertices(
                av_sorted, v, t, faces, plan=plan, compact_faces=cfaces
            )

        _timeit("deform.deform_with_vertices (face plan)",
                jax.jit(deform_planned), verts, vtrans)
    except Exception as e:  # noqa: BLE001
        print(f"[deform] planned path FAILED: {str(e)[:300]}", flush=True)

    # gathers alone: the 13 per-texel component gathers from (B, V)
    bind = avatar.uv_binding_face
    fb0 = faces[bind, 0]

    def gathers(v):
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        out = 0.0
        for f in (faces[bind, 0], faces[bind, 1], faces[bind, 2]):
            out = out + vx[:, f] + vy[:, f] + vz[:, f]
        return out

    _timeit("deform.9 component gathers", jax.jit(gathers), verts)


def stage_bin(sc):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import tile_rect

    proj, contributing = _proj_bin_inputs(sc)
    size, st = sc["size"], sc["settings"]
    fn = jax.jit(lambda m, d, r, v: bin_gaussians(m, d, r, v, size, size, st))
    ranges, order, nv, ntr = _timeit(
        "bin (full)", fn,
        proj.mean2d, proj.depth, proj.radius_bin, contributing)
    print(f"[bin] num_valid instances = {int(np.asarray(nv))} "
          f"num_truncated = {int(np.asarray(ntr))}", flush=True)

    # sub-parts: where does the bin time actually go?
    P = proj.mean2d.shape[0]

    def presort(d, m, r):
        x0, y0, x1, y1 = tile_rect(m, r, size, size, st.tile)
        return jax.lax.sort(
            (d, x0, y0, x1 - x0, y1 - y0,
             jnp.arange(P, dtype=jnp.int32)), num_keys=1)[0]

    _timeit("bin.presort (P-row, 6 arrays)", jax.jit(presort),
            proj.depth, proj.mean2d, proj.radius_bin)

    def topk(r):
        need = (r[:, 0] * r[:, 1]).astype(jnp.int32)
        return jax.lax.top_k(need, min(st.large_k, P))[1]

    if st.large_k > 0:
        _timeit("bin.top_k(8192)", jax.jit(topk),
                proj.radius_bin.astype(jnp.float32))

    N = P * st.max_tiles_per_gaussian + min(st.large_k, P) * st.tpg_large

    def bigsort(key, payload):
        return jax.lax.sort((key, payload), num_keys=1)[1]

    import numpy as _np

    rng = _np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 28, N).astype(_np.int32))
    payload = jnp.asarray(rng.integers(0, P, N).astype(_np.int32))
    _timeit(f"bin.bigsort ({N/1e6:.2f}M x 2 i32)", jax.jit(bigsort),
            key, payload)


def stage_bin2(sc):
    """Where bin's non-sort ~5 ms goes: full bin under the 4 cull/presort
    variants, then the micro-ops under suspicion (large-class scatter/
    gathers, searchsorted ranges, duplication slot math)."""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import bin_gaussians

    proj, contributing = _proj_bin_inputs(sc)
    size, st = sc["size"], sc["settings"]
    P = proj.mean2d.shape[0]

    for name, sv in [
        ("cull+presort", st._replace(tile_cull=True, presort=True)),
        ("cull+nopresort", st._replace(tile_cull=True, presort=False)),
        ("nocull+presort", st._replace(tile_cull=False, presort=True)),
        ("nocull+nopresort", st._replace(tile_cull=False, presort=False)),
    ]:
        fn = jax.jit(lambda m, d, r, v, c2, a2, sv=sv: bin_gaussians(
            m, d, r, v, size, size, sv, conic=c2, alpha=a2))
        _, _, nv, ntr = _timeit(
            f"bin2.{name}", fn, proj.mean2d, proj.depth, proj.radius_bin,
            contributing, proj.conic, proj.alpha)
        print(f"[bin2.{name}] num_valid={int(np.asarray(nv))} "
              f"num_truncated={int(np.asarray(ntr))}", flush=True)

    rng = np.random.default_rng(0)
    lk = min(st.large_k, P)
    large_pos = jnp.asarray(
        rng.choice(P, lk, replace=False).astype(np.int32))
    _timeit("bin2.scatter_set_false(large_k rows)",
            jax.jit(lambda v, lp: v.at[lp].set(False)),
            contributing, large_pos)
    xf = proj.depth
    _timeit("bin2.gather_6f32_by_large_pos",
            jax.jit(lambda a, lp: sum(a[lp] + i for i in range(6))),
            xf, large_pos)

    N = P * st.max_tiles_per_gaussian + lk * st.tpg_large
    sorted_tile = jnp.sort(
        jnp.asarray(rng.integers(0, 257, N).astype(np.int32)))
    q = jnp.arange(257, dtype=jnp.int32)
    _timeit("bin2.searchsorted_scan(257 over N)",
            jax.jit(lambda s: jnp.searchsorted(s, q, method="scan")),
            sorted_tile)

    def dup_math(x0_, rw_):
        cap = st.max_tiles_per_gaussian
        rw_c = jnp.minimum(rw_, cap)
        rh_c = jnp.minimum(rw_, (cap + rw_c - 1) // jnp.maximum(rw_c, 1))
        d = jnp.arange(cap, dtype=jnp.int32)
        dy = d[None, :] // jnp.maximum(rw_c[:, None], 1)
        dx = d[None, :] % jnp.maximum(rw_c[:, None], 1)
        return ((x0_[:, None] + dy) * 16 + (x0_[:, None] + dx)).reshape(-1)

    x0i = jnp.asarray(rng.integers(0, 14, P).astype(np.int32))
    _timeit("bin2.dup_base_slot_math", jax.jit(dup_math), x0i, x0i)
    _timeit("bin2.num_potential_sum",
            jax.jit(lambda rw: jnp.sum(jnp.where(rw > 0, rw * rw, 0))), x0i)


def stage_raster2(sc):
    """The orchestration overhead around the blend: per-gaussian row pack,
    tiled->image untile, HWC->CHW relayout, and full rasterize in both
    output layouts (NHWC should save the relayouts)."""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import (
        _CCH, _GEOM, _PK, NUM_CHANNELS, _tiled_to_image, rasterize,
    )

    gs, cam, st = sc["gs"], sc["cam"], sc["settings"]
    H = W = sc["size"]
    P = gs.xyz.shape[1]
    rng = np.random.default_rng(2)

    def pack(mean2d, conic, alpha, colors, invd):
        return jnp.concatenate(
            [mean2d, conic, alpha[:, None], jnp.zeros((P, 2), jnp.float32),
             colors, invd[:, None],
             jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32)],
            axis=-1)

    _timeit("raster2.per_gauss pack (P,128)", jax.jit(pack),
            jnp.asarray(rng.normal(size=(P, 2)), jnp.float32),
            jnp.asarray(rng.normal(size=(P, 3)), jnp.float32),
            jnp.asarray(rng.uniform(size=P), jnp.float32),
            gs.colors[0], jnp.asarray(rng.uniform(size=P), jnp.float32))

    gy = H // st.tile
    tiled = jnp.asarray(
        rng.uniform(size=(gy, gy, _CCH, st.tile * st.tile)), jnp.float32)
    _timeit("raster2.tiled_to_image", jax.jit(
        lambda t: _tiled_to_image(t, H, W, st.tile)), tiled)
    hwc = jnp.asarray(rng.uniform(size=(H, W, _CCH)), jnp.float32)
    _timeit("raster2.HWC->CHW transpose", jax.jit(
        lambda x: jnp.transpose(x[:, :, :NUM_CHANNELS], (2, 0, 1))), hwc)

    for name, cf in [("chw", True), ("nhwc", False)]:
        fn = jax.jit(lambda x, c, o, s, q, cf=cf: rasterize(
            x, c, o, s, q, cam, jnp.zeros(32), st, channels_first=cf)[0])
        _timeit(f"raster2.full_{name}", fn, gs.xyz[0], gs.colors[0],
                gs.opacity[0], gs.scaling[0], gs.rotation[0])

    for name, sv in [("cull", st), ("nocull", st._replace(tile_cull=False))]:
        fn = jax.jit(lambda x, c, o, s, q, sv=sv: rasterize(
            x, c, o, s, q, cam, jnp.zeros(32), sv, channels_first=False)[0])
        _timeit(f"raster2.full_nhwc_{name}", fn, gs.xyz[0], gs.colors[0],
                gs.opacity[0], gs.scaling[0], gs.rotation[0])


def stage_gather(sc):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import _PK, bin_gaussians

    proj, contributing = _proj_bin_inputs(sc)
    size, st = sc["size"], sc["settings"]
    ranges, order, nv, _ = jax.jit(
        lambda m, d, r, v: bin_gaussians(m, d, r, v, size, size, st))(
        proj.mean2d, proj.depth, proj.radius_bin, contributing)
    P = proj.mean2d.shape[0]
    per_gauss = jnp.zeros((P, _PK), jnp.float32)
    fn = jax.jit(lambda pg, o: pg[o])
    _timeit(f"gather ({order.shape[0]}, {_PK}) f32", fn, per_gauss, order)


def stage_blend(sc):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import _CCH, _PK, bin_gaussians, blend_tiles

    proj, contributing = _proj_bin_inputs(sc)
    size, st = sc["size"], sc["settings"]
    ranges, order, nv, _ = jax.jit(
        lambda m, d, r, v: bin_gaussians(m, d, r, v, size, size, st))(
        proj.mean2d, proj.depth, proj.radius_bin, contributing)
    P = proj.mean2d.shape[0]
    rng = np.random.default_rng(1)
    per_gauss = jnp.asarray(rng.uniform(0, 0.5, (P, _PK)), jnp.float32)
    G = st.chunk
    pad_rows = ((order.shape[0] + G - 1) // G + 1) * G - order.shape[0]
    order = jnp.concatenate([order, jnp.zeros((pad_rows,), order.dtype)])
    bg = jnp.zeros(_CCH)
    fn = jax.jit(lambda t_, o_, r_: blend_tiles(
        t_, o_, r_, bg, size, size, st.tile, st.chunk, st.dma_banks))
    _timeit("blend kernel (fused row-gather)", fn, per_gauss, order, ranges)


def stage_raster1(sc):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import rasterize

    gs, cam, st = sc["gs"], sc["cam"], sc["settings"]

    @jax.jit
    def once(xyz, colors, opac, scales, rots):
        c, r, i = rasterize(xyz, colors, opac, scales, rots, cam,
                            jnp.zeros(32), st)
        return jnp.sum(c), jnp.max(r), jnp.sum(i)

    out = _timeit("rasterize 512^2 full", once, gs.xyz[0], gs.colors[0],
                  gs.opacity[0], gs.scaling[0], gs.rotation[0])
    print(f"[raster1] sum={float(out[0]):.4f} rmax={float(out[1]):.0f}",
          flush=True)

    # everything EXCEPT the blend kernel + image untiling: project + bin +
    # per-gaussian row packing. raster1 minus this minus blend-stage =
    # what the orchestration itself costs in context.
    from guava_renderer_tpu.ops.gsplat import (
        _CCH, _GEOM, _PK, ALPHA_MIN, NUM_CHANNELS, bin_gaussians,
    )
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    H = W = sc["size"]

    @jax.jit
    def noblend(xyz, colors, opac, scales, rots):
        proj = project_gaussians(xyz, scales, rots, opac, cam,
                                 st.scale_modifier, st.antialiasing)
        contributing = proj.valid & (
            jax.lax.stop_gradient(proj.alpha) >= ALPHA_MIN)
        ranges, order, _, _ = bin_gaussians(
            jax.lax.stop_gradient(proj.mean2d),
            jax.lax.stop_gradient(proj.depth),
            proj.radius_bin, contributing, W, H, st)
        P = xyz.shape[0]
        invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
        per_gauss = jnp.concatenate(
            [proj.mean2d, proj.conic, proj.alpha[:, None],
             jnp.zeros((P, 2), jnp.float32), colors, invd[:, None],
             jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32)],
            axis=-1)
        return jnp.sum(per_gauss), jnp.sum(order), ranges[-1]

    _timeit("raster1.project+bin+pack (no blend)", noblend, gs.xyz[0],
            gs.colors[0], gs.opacity[0], gs.scaling[0], gs.rotation[0])


def stage_loop_noref(sc, frames=3):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import rasterize

    def frame(pose_scale):
        body = sc["base_body"]._replace(
            body_pose=sc["base_body"].body_pose + pose_scale * 0.01)
        res = sc["ehm_forward"](sc["ehm"], body, sc["base_flame"])
        gs = sc["deform"](sc["avatar"], res.vertices, res.vertex_transforms,
                          sc["faces"])
        c, _, _ = rasterize(gs.xyz[0], gs.colors[0], gs.opacity[0],
                            gs.scaling[0], gs.rotation[0],
                            sc["cam"], jnp.zeros(32), sc["settings"])
        return jnp.sum(c)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(
            0, frames, lambda i, acc: acc + frame(acc * 1e-12 + i), x)

    _timeit(f"{frames}-frame loop noref", run, 0.0, reps=2)


def stage_refiner(sc, frames=5):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.renderer import NeuralRefiner

    size = sc["size"]
    refiner = NeuralRefiner(image_size=size, small=True)
    feat0 = jnp.zeros((1, size, size, 32))
    ref_params = refiner.init(jax.random.PRNGKey(0), feat0)

    @jax.jit
    def run(x):
        def body(i, acc):
            rgb = refiner.apply(ref_params, feat0 + acc * 1e-12 + 0.0 * i)
            return acc + jnp.sum(rgb)
        return jax.lax.fori_loop(0, frames, body, x)

    _timeit(f"refiner-only x{frames}", run, jnp.float32(0), reps=2)

    ref_bf16 = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        ref_params,
    )
    feat_bf16 = feat0.astype(jnp.bfloat16)

    @jax.jit
    def run_bf16(x):
        def body(i, acc):
            rgb = refiner.apply(
                ref_bf16, feat_bf16 + (acc * 1e-12 + 0.0 * i).astype(jnp.bfloat16)
            )
            return acc + jnp.sum(rgb.astype(jnp.float32))
        return jax.lax.fori_loop(0, frames, body, x)

    _timeit(f"refiner-only bf16 x{frames}", run_bf16, jnp.float32(0), reps=2)


def stage_refiner2(sc, reps=8):
    """Refiner micro-parts: where do the 9.7 ms actually go?"""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.models.layers import (
        downsample2x, resize_bilinear, upsample2x,
    )
    from guava_renderer_tpu.models.styleunet import ModulatedConv, StyleMLP

    size = sc["size"]

    def loop(fn, x0):
        @jax.jit
        def run(s):
            def body(i, acc):
                return acc + jnp.sum(fn(x0 + acc * 1e-12))
            return jax.lax.fori_loop(0, reps, body, s)
        return run

    # bilinear up/down chains at the refiner's scales (ch from _CHANNELS)
    for ch, s in ((16, size), (32, size // 2), (64, size // 4)):
        x = jnp.zeros((1, s // 2, s // 2, ch))
        _timeit(f"refiner2.upsample2x {s//2}->{s} ch{ch}",
                loop(upsample2x, x), jnp.float32(0), reps=2)
        y = jnp.zeros((1, s, s, ch))
        _timeit(f"refiner2.downsample2x {s}->{s//2} ch{ch}",
                loop(downsample2x, y), jnp.float32(0), reps=2)

    # plain 3x3 conv at the top scale
    import flax.linen as nn

    conv = nn.Conv(16, (3, 3), padding=1)
    x = jnp.zeros((1, size, size, 16))
    cp = conv.init(jax.random.PRNGKey(0), x)
    _timeit(f"refiner2.conv3x3 {size} ch16->16",
            loop(lambda v: conv.apply(cp, v), x), jnp.float32(0), reps=2)

    # modulated conv at the top scale (the generator's per-scale cost)
    mc = ModulatedConv(16, 3, 512)
    st = jnp.zeros((1, 512))
    mp = mc.init(jax.random.PRNGKey(0), x, st)
    _timeit(f"refiner2.modconv3x3 {size} ch16->16",
            loop(lambda v: mc.apply(mp, v, st), x), jnp.float32(0), reps=2)

    # style MLP (8 x 512-dense at batch 1)
    mlp = StyleMLP(512, 8)
    sv = jnp.zeros((1, 512))
    sp = mlp.init(jax.random.PRNGKey(0), sv)
    _timeit("refiner2.style_mlp 8x512",
            loop(lambda v: mlp.apply(sp, v), sv), jnp.float32(0), reps=2)

    # full-image bilinear resize (in_size != out_size path)
    big = jnp.zeros((1, size, size, 32))
    _timeit(f"refiner2.resize {size}->{size//2} ch32",
            loop(lambda v: resize_bilinear(v, (size // 2, size // 2)), big),
            jnp.float32(0), reps=2)


def stage_refiner3(sc, reps=8):
    """Conv-lowering experiments: a plain 3x3 conv at 512^2 x 16ch measured
    2.4 ms RTT-corrected (refiner2, r8) — ~60x off its 1.2 GFLOP. Find the
    formulation XLA lowers well."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    size = sc["size"]

    def loop(fn, x0):
        @jax.jit
        def run(s):
            def body(i, acc):
                return acc + jnp.sum(fn(x0 + acc * 1e-12).astype(jnp.float32))
            return jax.lax.fori_loop(0, reps, body, s)
        return run

    rng = jax.random.PRNGKey(0)
    for ch in (16, 32, 64, 128):
        x = jnp.zeros((1, size, size, ch))
        conv = nn.Conv(ch, (3, 3), padding=1)
        cp = conv.init(rng, x)
        _timeit(f"refiner3.conv3x3 {size} ch{ch} NHWC",
                loop(lambda v, conv=conv, cp=cp: conv.apply(cp, v), x),
                jnp.float32(0), reps=2)

    # 9-shifted-matmul formulation at ch16
    ch = 16
    x = jnp.zeros((1, size, size, ch))
    w9 = jnp.zeros((9, ch, ch))

    def conv_shift(v):
        out = jnp.zeros_like(v)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = jnp.roll(v, (dy, dx), axis=(1, 2))
                out = out + s @ w9[k]
                k += 1
        return out

    _timeit(f"refiner3.conv3x3 {size} ch16 9-shift-matmul",
            loop(conv_shift, x), jnp.float32(0), reps=2)

    # im2col + one matmul
    wim = jnp.zeros((9 * ch, ch))

    def conv_im2col(v):
        p = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [p[:, dy:dy + size, dx:dx + size] for dy in range(3)
             for dx in range(3)], axis=-1)
        return cols @ wim

    _timeit(f"refiner3.conv3x3 {size} ch16 im2col-matmul",
            loop(conv_im2col, x), jnp.float32(0), reps=2)

    # NCHW dimension numbers
    wn = jnp.zeros((ch, ch, 3, 3))
    xn = jnp.zeros((1, ch, size, size))

    def conv_nchw(v):
        return jax.lax.conv_general_dilated(
            v, wn, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    _timeit(f"refiner3.conv3x3 {size} ch16 NCHW",
            loop(conv_nchw, xn), jnp.float32(0), reps=2)

    # bf16 NHWC
    xb = jnp.zeros((1, size, size, ch), jnp.bfloat16)
    convb = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16)
    cpb = convb.init(rng, xb)
    _timeit(f"refiner3.conv3x3 {size} ch16 NHWC bf16",
            loop(lambda v: convb.apply(cpb, v), xb), jnp.float32(0), reps=2)

    # matrix-form bilinear resize (two einsums) vs jax.image.resize
    big = jnp.zeros((1, size, size, 32))
    wy = jnp.zeros((size // 2, size))

    def resize_mm(v):
        t = jnp.einsum("bhwc,oh->bowc", v, wy)
        return jnp.einsum("bhwc,ow->bhoc", t, wy)

    _timeit(f"refiner3.resize-matmul {size}->{size//2} ch32",
            loop(resize_mm, big), jnp.float32(0), reps=2)


def stage_quality512(sc):
    """Quantify the cap-truncation quality cost on the full-scale scene
    with the BENCH's trained-avatar scale/opacity mixture (the diag
    scene's uniform draws don't truncate at all; the bench one loses 105k
    instances to caps at the parity config, bench.py --stats-only): render
    at the parity raster config and at a near-uncapped one (tpg 8 +
    32768x64), print PSNR between them."""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices
    from guava_renderer_tpu.ops.gsplat import rasterize

    # trained-avatar mixture, matching bench.py trained_stats_* exactly
    rng = np.random.default_rng(0)

    def mix_scales(n, base):
        u = rng.uniform(0, 1, n)
        s = np.where(
            u < 0.85, rng.lognormal(-4.2, 0.3, n),
            np.where(u < 0.95, rng.lognormal(-3.0, 0.3, n),
                     rng.lognormal(-1.9, 0.4, n)),
        ) * base
        aniso = rng.lognormal(0, 0.2, (n, 2))
        return jnp.asarray(
            np.stack([s, s * aniso[:, 0], s * aniso[:, 1]], -1),
            jnp.float32)[None]

    def mix_opacity(n):
        return jnp.asarray(
            1.0 / (1.0 + np.exp(-rng.normal(-1.0, 1.5, (1, n, 1)))),
            jnp.float32)

    avatar = sc["avatar"]
    V = avatar.vtx_positions.shape[1]
    N_uv = avatar.uv_local_xyz.shape[1]
    avatar = avatar._replace(
        vtx_scales=mix_scales(V, 0.7), vtx_opacity=mix_opacity(V),
        uv_scales=mix_scales(N_uv, 40.0), uv_opacity=mix_opacity(N_uv),
    )
    res = sc["ehm_forward"](sc["ehm"], sc["base_body"], sc["base_flame"])
    gs = deform_with_vertices(avatar, res.vertices, res.vertex_transforms,
                              sc["faces"])

    cam, st = sc["cam"], sc["settings"]
    hi = st._replace(max_tiles_per_gaussian=8, large_k=32768, tpg_large=64)

    def render(stv):
        fn = jax.jit(lambda x, c, o, s, q: rasterize(
            x, c, o, s, q, cam, jnp.zeros(32), stv, channels_first=False)[0])
        return np.asarray(fn(gs.xyz[0], gs.colors[0], gs.opacity[0],
                             gs.scaling[0], gs.rotation[0]))

    ref = render(hi)
    for name, stv in [("parity", st),
                      ("parity-nocull", st._replace(tile_cull=False))]:
        out = render(stv)
        mse = float(((out - ref) ** 2).mean())
        psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
        print(f"[quality512] {name} vs near-uncapped: psnr={psnr:.1f} dB "
              f"maxdiff={np.abs(out - ref).max():.4f}", flush=True)


def stage_full(sc, frames=3):
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.renderer import NeuralRefiner
    from guava_renderer_tpu.ops.gsplat import rasterize

    size = sc["size"]
    refiner = NeuralRefiner(image_size=size, small=True)
    feat0 = jnp.zeros((1, size, size, 32))
    ref_params = refiner.init(jax.random.PRNGKey(0), feat0)

    def frame(pose_scale):
        body = sc["base_body"]._replace(
            body_pose=sc["base_body"].body_pose + pose_scale * 0.01)
        res = sc["ehm_forward"](sc["ehm"], body, sc["base_flame"])
        gs = sc["deform"](sc["avatar"], res.vertices, res.vertex_transforms,
                          sc["faces"])
        c, _, _ = rasterize(gs.xyz[0], gs.colors[0], gs.opacity[0],
                            gs.scaling[0], gs.rotation[0],
                            sc["cam"], jnp.zeros(32), sc["settings"])
        rgb = refiner.apply(ref_params, jnp.transpose(c, (1, 2, 0))[None])
        return jnp.sum(rgb.astype(jnp.float32))

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(
            0, frames, lambda i, acc: acc + frame(acc * 1e-12 + i), x)

    out = _timeit(f"{frames}-frame FULL loop", run, 0.0, reps=2)
    print(f"[full] r={float(out):.4f}", flush=True)


def stage_frame_parts(sc, frames=3):
    """Cumulative frame slices, each its own jitted fori_loop: deform ->
    +project+bin -> +full raster -> +refiner(bf16). Successive deltas give
    each stage's cost INSIDE a fused frame program (the composition the
    bench actually runs), instead of isolated-stage numbers that miss or
    double-count XLA fusion across stage boundaries."""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.renderer import NeuralRefiner
    from guava_renderer_tpu.ops.gsplat import bin_gaussians, rasterize
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    size, st = sc["size"], sc["settings"]
    refiner = NeuralRefiner(image_size=size, small=True)
    ref_params = refiner.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 32)))
    ref_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        ref_params)

    def deformed(pose_scale):
        body = sc["base_body"]._replace(
            body_pose=sc["base_body"].body_pose + pose_scale * 0.01)
        res = sc["ehm_forward"](sc["ehm"], body, sc["base_flame"])
        return sc["deform"](sc["avatar"], res.vertices,
                            res.vertex_transforms, sc["faces"])

    def part_deform(pose_scale):
        gs = deformed(pose_scale)
        return jnp.sum(gs.xyz) + jnp.sum(gs.rotation) + jnp.sum(gs.scaling)

    def part_bin(pose_scale):
        gs = deformed(pose_scale)
        proj = project_gaussians(gs.xyz[0], gs.scaling[0], gs.rotation[0],
                                 gs.opacity[0], sc["cam"])
        contributing = proj.valid & (proj.alpha >= 1.0 / 255.0)
        out = bin_gaussians(proj.mean2d, proj.depth, proj.radius_bin,
                            contributing, size, size, st,
                            conic=proj.conic, alpha=proj.alpha)
        ranges, order = out[0], out[1]
        return (jnp.sum(ranges.astype(jnp.float32)) * 1e-6
                + jnp.sum(order.astype(jnp.float32)) * 1e-9)

    def part_raster(pose_scale):
        gs = deformed(pose_scale)
        color, _, _ = rasterize(gs.xyz[0], gs.colors[0], gs.opacity[0],
                                gs.scaling[0], gs.rotation[0],
                                sc["cam"], jnp.zeros(32), st,
                                channels_first=False)
        return jnp.sum(color)

    def part_full(pose_scale):
        gs = deformed(pose_scale)
        color, _, _ = rasterize(gs.xyz[0], gs.colors[0], gs.opacity[0],
                                gs.scaling[0], gs.rotation[0],
                                sc["cam"], jnp.zeros(32), st,
                                channels_first=False)
        rgb = refiner.apply(ref_params, color[None].astype(jnp.bfloat16))
        return jnp.sum(rgb.astype(jnp.float32))

    for label, part in [("deform", part_deform), ("+bin", part_bin),
                        ("+raster", part_raster), ("+refiner", part_full)]:
        def run(x, _part=part):
            return jax.lax.fori_loop(
                0, frames, lambda i, acc: acc + _part(acc * 1e-12 + i), x)
        _timeit(f"frame_parts.{label} ({frames}-frame loop)",
                jax.jit(run), 0.0, reps=2, iters=4)
    print("[frame_parts] done (per-frame cost of a slice = steady/"
          f"{frames}; stage cost = delta between successive slices)",
          flush=True)


def run_stage(name, out_dir, platform, size_classes=(), vmem_classes=0,
              bench_scene=False, tile=32):
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(platform)
    if name == "golden":
        stage_golden(out_dir)
        return
    if bench_scene:
        # the REAL bench scene (trained-stats splats, guava_renderer_tpu/
        # benchscene.py) instead of the uniform-draw diag scene, so stage
        # deltas describe the headline number's workload
        from guava_renderer_tpu.avatar.deformer import deform_with_vertices
        from guava_renderer_tpu.benchscene import (
            frame0_gaussians, make_bench_scene,
        )
        from guava_renderer_tpu.bodymodel.ehm import ehm_forward
        from guava_renderer_tpu.ops.gsplat import RasterizeSettings

        b = make_bench_scene()
        sc = dict(ehm=b.ehm, faces=b.faces, avatar=b.avatar, cam=b.cam,
                  settings=RasterizeSettings(
                      tile=tile, chunk=32, max_tiles_per_gaussian=2,
                      large_k=8192, tpg_large=32),
                  base_body=b.base_body, base_flame=b.base_flame,
                  gs=frame0_gaussians(b), ehm_forward=ehm_forward,
                  deform=deform_with_vertices, size=b.size)
    else:
        sc = build_scene()
    if size_classes or vmem_classes:
        sc["settings"] = sc["settings"]._replace(
            size_classes=tuple(size_classes), vmem_classes=vmem_classes)
    {
        "deform": stage_deform,
        "project": stage_project,
        "bin": stage_bin,
        "bin2": stage_bin2,
        "raster2": stage_raster2,
        "quality512": stage_quality512,
        "gather": stage_gather,
        "blend": stage_blend,
        "raster1": stage_raster1,
        "loop_noref": stage_loop_noref,
        "refiner": stage_refiner,
        "refiner2": stage_refiner2,
        "refiner3": stage_refiner3,
        "frame_parts": stage_frame_parts,
        "full": stage_full,
    }[name](sc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None, choices=STAGES + EXTRA_STAGES)
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument("--out", default="outputs/bench/tpu_diag")
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--stage-timeout", type=float, default=1800.0)
    ap.add_argument("--skip-probe", action="store_true",
                    help="caller already probed the tunnel")
    ap.add_argument("--size-classes", default="",
                    help="rect-area cap ladder 'area:cap,...' (bench.py "
                         "--size-classes syntax); e.g. the EXACT ladder "
                         "256:256,3840:64,28672:16,32768:4")
    ap.add_argument("--vmem-classes", type=int, default=0)
    ap.add_argument("--bench-scene", action="store_true",
                    help="use the canonical trained-stats bench scene "
                         "(benchscene.py) instead of the uniform diag scene")
    ap.add_argument("--tile", type=int, default=32)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    size_classes = tuple(
        tuple(int(v) for v in p.split(":"))
        for p in args.size_classes.split(",") if p
    )

    if args.stage:
        # child mode: one stage in-process
        try:
            run_stage(args.stage, args.out, args.platform,
                      size_classes=size_classes,
                      vmem_classes=args.vmem_classes,
                      bench_scene=args.bench_scene, tile=args.tile)
        except Exception:
            print(f"[{args.stage}] FAILED:", flush=True)
            traceback.print_exc()
            sys.exit(1)
        return

    from guava_renderer_tpu.utils.platform import probe_backend

    if args.platform == "axon":
        ok, detail = ((True, "skipped") if args.skip_probe
                      else probe_backend("axon", timeout_s=120))
        if not ok:
            print(f"DIAG SKIPPED: backend unavailable ({detail})")
            sys.exit(2)

    for name in args.stages.split(","):
        print(f"===== stage {name} =====", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, "--out", args.out,
                 "--platform", args.platform,
                 "--size-classes", args.size_classes,
                 "--vmem-classes", str(args.vmem_classes),
                 "--tile", str(args.tile)]
                + (["--bench-scene"] if args.bench_scene else []),
                timeout=args.stage_timeout,
            )
            status = f"exit={r.returncode}"
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
        print(f"===== stage {name}: {status} ({time.time()-t0:.0f}s) =====",
              flush=True)
    print("[diag] done")


if __name__ == "__main__":
    main()
