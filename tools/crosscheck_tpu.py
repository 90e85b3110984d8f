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
    args = ap.parse_args()
    platform = "axon" if args.platform == "tpu" else args.platform

    from guava_renderer_tpu.utils.platform import pin_platform, probe_backend

    if platform == "axon" and not args.skip_probe:
        ok, detail = probe_backend(platform, timeout_s=120)
        if not ok:
            print(f"CROSSCHECK SKIPPED: backend unavailable ({detail})")
            sys.exit(2)
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
