"""On-chip compiled-vs-interpret rasterizer cross-check.

Mosaic compilation has constraints interpret mode does not model (lane
alignment, sublane reshapes, scalar-only while carries); this script renders
the committed golden scene with the COMPILED Pallas kernel on the real TPU
and compares against both the interpret-mode render and the committed
oracle output. Run whenever the tunnel is up after touching ops/gsplat*:

    python tools/crosscheck_tpu.py            # axon TPU (probed first)
    python tools/crosscheck_tpu.py --platform cpu   # sanity: interpret only

Exit code 0 = all diffs within tolerance; prints a one-line summary.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "raster_scene_v1.npz")


def _train_settings():
    """The training config's MODEL.raster block — the one source of truth
    (configs/train/ubody_512.yaml; since r4 this is the zero-truncation
    EXACT ladder)."""
    import yaml

    from guava_renderer_tpu.ops.gsplat import RasterizeSettings

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "configs", "train", "ubody_512.yaml")) as f:
        r = yaml.safe_load(f)["MODEL"]["raster"]
    r["size_classes"] = tuple(
        (int(c), int(k)) for c, k in r.get("size_classes", ())
    )
    return RasterizeSettings(**r)


def _flat_settings(st):
    """The r3 flat-cap parity config (tpg 2 + 8192x32) — kept as the gate's
    truncation-cost A/B arm after the production config moved to the exact
    ladder."""
    return st._replace(size_classes=(), large_k=8192, tpg_large=32)


def _psnr(a, b):
    mse = float(((np.asarray(a) - np.asarray(b)) ** 2).mean())
    return float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)


CROP = 128  # dense-oracle center-crop side (full 512^2 is hours on 1 core)


def _crop_window(size: int):
    off = (size - CROP) // 2
    return (off, off, CROP, CROP)


def _compute_oracle(path: str):
    """CPU: uncapped dense-oracle composite of the exact bench scene
    (global depth sort, tile-rect coverage, no duplication caps — the CUDA
    pipeline's semantics, ref: rasterizer_impl.cu:292-311) over a 128^2
    CENTER CROP (the O(P*H*W) dense scan is ~hours at full 512^2 on this
    1-core box; the crop keeps identical per-pixel semantics at 1/16 the
    work and covers the avatar's densest region), plus the truncation
    counts of the parity and exact-ladder binning configs at FULL frame."""
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform("cpu")

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.benchscene import (
        EXACT_LADDER, frame0_gaussians, make_bench_scene,
    )
    from guava_renderer_tpu.ops.gsplat import (
        ALPHA_MIN, bin_gaussians,
    )
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians
    from guava_renderer_tpu.ops.gsplat_reference import rasterize_reference

    sc = make_bench_scene()
    gs = frame0_gaussians(sc)
    bg = jnp.zeros(32)
    st = _train_settings()

    print("[oracle] dense composite over "
          f"P={gs.xyz.shape[1]} @ center {CROP}^2 of {sc.size}^2 "
          "(CPU, one-off, cached)...", flush=True)
    color, _, invd = jax.jit(
        lambda x, c, o, s, q: rasterize_reference(
            x, c, o, s, q, sc.cam, bg, tile=st.tile,
            window=_crop_window(sc.size))
    )(gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0], gs.rotation[0])

    # truncation accounting for both configs (mirrors bench.py --stats-only)
    proj = project_gaussians(gs.xyz[0], gs.scaling[0], gs.rotation[0],
                             gs.opacity[0], sc.cam,
                             st.scale_modifier, st.antialiasing)
    contributing = proj.valid & (proj.alpha.reshape(-1) >= ALPHA_MIN)
    truncs = {}
    for name, stv in [("flat", _flat_settings(st)),
                      ("exact", st._replace(size_classes=EXACT_LADDER))]:
        out = bin_gaussians(proj.mean2d, proj.depth, proj.radius_bin,
                            contributing, sc.size, sc.size, stv,
                            conic=proj.conic, alpha=proj.alpha)
        truncs[name] = (int(np.asarray(out[-2])), int(np.asarray(out[-1])))
        print(f"[oracle] {name}: instances={truncs[name][0]} "
              f"truncated={truncs[name][1]}", flush=True)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, color=np.asarray(color), invd=np.asarray(invd),
        flat_instances=truncs["flat"][0],
        flat_truncated=truncs["flat"][1],
        exact_instances=truncs["exact"][0],
        exact_truncated=truncs["exact"][1],
    )
    print(f"[oracle] cached -> {path}", flush=True)


def _full_scale_gate(platform: str, oracle_path: str):
    """BASELINE.md quality gate at the REAL bench config and scale: on-chip
    renders of the exact 512^2 trained-stats scene, judged two ways —
    (a) the zero-truncation exact-ladder render (the production config,
        configs/train/ubody_512.yaml) IS the uncapped composite by
        construction (every instance emitted, same duplication semantics
        as rasterizer_impl.cu:292-311); its center crop must match the
        independent CPU dense-oracle crop >= 50 dB (well inside the
        0.5 dB BASELINE budget; same bar as the golden-scene gate), and
    (b) the r3 flat-cap config's full-frame PSNR vs the exact render
        measures exactly what its truncation used to cost."""
    import subprocess
    import sys as _sys

    if not os.path.isfile(oracle_path):
        print(f"[full-scale] no cached oracle at {oracle_path}; computing "
              "in a CPU subprocess...", flush=True)
        r = subprocess.run(
            [_sys.executable, os.path.abspath(__file__), "--oracle-only",
             "--oracle-path", oracle_path],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0 or not os.path.isfile(oracle_path):
            print("FULL-SCALE FAIL: oracle computation failed")
            sys.exit(1)

    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(platform)

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.benchscene import (
        EXACT_LADDER, frame0_gaussians, make_bench_scene,
    )
    from guava_renderer_tpu.ops.gsplat import rasterize

    o = np.load(oracle_path)
    sc = make_bench_scene()
    gs = frame0_gaussians(sc)
    bg = jnp.zeros(32)
    st = _train_settings()
    configs = [
        ("flat", _flat_settings(st)),
        ("exact", st._replace(size_classes=EXACT_LADDER)),
    ]
    out = {}
    for name, stv in configs:
        fn = jax.jit(lambda x, c, op, s, q, stv=stv: rasterize(
            x, c, op, s, q, sc.cam, bg, stv)[0])
        print(f"[full-scale] rendering {name} on "
              f"{jax.devices()[0].platform}...", flush=True)
        out[name] = np.asarray(
            fn(gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
               gs.rotation[0]))

    y0, x0, h, w = _crop_window(sc.size)
    crop = lambda img: np.asarray(img)[:, y0:y0 + h, x0:x0 + w]  # noqa: E731
    p_ex = _psnr(crop(out["exact"]), o["color"])
    p_par = _psnr(crop(out["flat"]), o["color"])
    p_pe = _psnr(out["flat"], out["exact"])
    n_tr = int(o["exact_truncated"])
    ok = p_ex >= 50.0 and n_tr == 0
    print(
        f"FULL-SCALE {'OK' if ok else 'FAIL'} on "
        f"{jax.devices()[0].platform}: exact-ladder crop vs uncapped "
        f"dense-oracle crop psnr={p_ex:.1f}dB (gate >=50; full-frame "
        f"truncation={n_tr} -> the exact render IS the uncapped "
        f"composite); flat-cap crop vs oracle psnr={p_par:.1f}dB; flat "
        f"vs exact FULL-frame psnr={p_pe:.1f}dB (truncation cost, "
        f"{int(o['flat_truncated'])}/{int(o['flat_instances'])} "
        "instances truncated)"
    )
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon", choices=["axon", "cpu", "tpu"])
    ap.add_argument("--atol", type=float, default=2e-4)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--skip-probe", action="store_true",
                    help="caller already probed the tunnel")
    ap.add_argument("--vmem", action="store_true",
                    help="gate the VMEM-resident classed-table path "
                         "(size_classes ladder + vmem_classes)")
    ap.add_argument("--streaming", action="store_true",
                    help="gate the streaming blend path (payload sort + "
                         "contiguous block DMAs; colors bf16 through the "
                         "sort, so oracle gates use bf16 tolerance)")
    ap.add_argument("--full-scale", action="store_true",
                    help="FULL-SCALE fidelity gate (BASELINE <=0.5 dB): "
                         "render the exact 512^2 bench scene (185k "
                         "trained-stats gaussians) on-chip at the parity "
                         "config AND a zero-truncation exact ladder, "
                         "compare both against the uncapped dense-oracle "
                         "composite (computed on CPU, cached on disk)")
    ap.add_argument("--oracle-only", action="store_true",
                    help="(internal) compute + cache the full-scale CPU "
                         "oracle composite, then exit")
    ap.add_argument("--oracle-path",
                    default="outputs/bench/fullscale_oracle_v1.npz")
    args = ap.parse_args()
    platform = "axon" if args.platform == "tpu" else args.platform

    if args.oracle_only:
        _compute_oracle(args.oracle_path)
        return

    from guava_renderer_tpu.utils.platform import pin_platform, probe_backend

    if platform == "axon" and not args.skip_probe:
        ok, detail = probe_backend(platform, timeout_s=120)
        if not ok:
            print(f"CROSSCHECK SKIPPED: backend unavailable ({detail})")
            sys.exit(2)

    if args.full_scale:
        _full_scale_gate(platform, args.oracle_path)
        return

    pin_platform(platform)

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize

    s = np.load(GOLDEN)
    cam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        tanfovx=jnp.asarray(float(s["tanfov"])), tanfovy=jnp.asarray(float(s["tanfov"])),
        width=int(s["size"]), height=int(s["size"]),
    )
    inputs = tuple(
        jnp.asarray(s[k]) for k in ("means", "colors", "opacity", "scales", "quats")
    )
    settings = RasterizeSettings(tile=args.tile, chunk=args.chunk,
                                 max_tiles_per_gaussian=8,
                                 streaming=args.streaming)
    if args.vmem:
        settings = settings._replace(
            max_tiles_per_gaussian=2,
            size_classes=((16, 64), (48, 24), (96, 8)), vmem_classes=2)
    color, radii, invd = jax.jit(
        lambda *a: rasterize(*a, cam, jnp.asarray(s["bg"]), settings)
    )(*inputs)
    color = np.asarray(color)

    # Gate 1 — Mosaic faithfulness: compiled vs interpret ON THE SAME
    # BACKEND must agree to fp noise (measured bitwise-identical in the r3
    # diag). This is the check that catches genuine kernel lowering bugs.
    from guava_renderer_tpu.ops import gsplat as _gs

    _gs._FORCE_INTERPRET = True
    try:
        color_i, radii_i, invd_i = jax.jit(
            lambda *a: rasterize(*a, cam, jnp.asarray(s["bg"]), settings)
        )(*inputs)
    finally:
        _gs._FORCE_INTERPRET = False
    d_interp = float(np.abs(color - np.asarray(color_i)).max())

    # Gate 2 — cross-backend fidelity vs the committed CPU-f32 oracle: the
    # TPU's bf16-input MXU compositing and transcendental rounding make
    # bitwise equality impossible; gate on PSNR (budget: <=0.5 dB delta vs
    # CUDA ref => demand >=50 dB vs oracle) + a sane max-diff ceiling.
    d_oracle = float(np.abs(color - s["color"]).max())
    mse = float(((color - s["color"]) ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    d_radii = int(np.abs(np.asarray(radii) - s["radii"]).max())
    d_invd = float(np.abs(np.asarray(invd) - s["invdepth"]).max())
    backend = jax.devices()[0].platform
    same_backend_exact = backend != "tpu"  # off-TPU both paths ARE interpret
    tol_oracle = args.atol if same_backend_exact else 0.05
    if args.streaming and same_backend_exact:
        # streaming pre-rounds colors+invdepth to bf16 (the one intended
        # delta vs the f32 oracle; on TPU the MXU rounds anyway)
        tol_oracle = 0.05
    ok = (
        d_interp <= args.atol
        and d_radii == 0
        and d_oracle <= tol_oracle
        and (same_backend_exact or psnr >= 50.0)
        and d_invd <= tol_oracle
    )
    print(
        f"CROSSCHECK {'OK' if ok else 'FAIL'} on {backend}: "
        f"|compiled-interpret|max={d_interp:.2e} "
        f"|color-oracle|max={d_oracle:.2e} psnr={psnr:.1f}dB "
        f"|radii|max={d_radii} |invd|max={d_invd:.2e} "
        f"(atol={args.atol:g}, tile={args.tile})"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
