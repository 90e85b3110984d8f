"""One-process TPU benchmark sweep.

Remote compiles through the axon tunnel are slow (30-60 s each) and only one
process may hold the chip, so when a tunnel window opens, run ALL variants
in one process:

    python tools/bench_variants.py                # full sweep on the chip
    python tools/bench_variants.py --quick        # 3 variants

Prints one JSON line per variant (same schema as bench.py) plus a SUMMARY
line with the best config — paste the winner into bench.py defaults.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINE_FPS, run_bench  # noqa: E402

PARITY = dict(tile=32, chunk=32, tpg=2, bf16=True, face_plan=True)
LADDER = ((256, 256), (3840, 64), (28672, 16), (32768, 4))
VARIANTS = [
    # (label, kwargs) — tile 32, tpg 2 + large(8192x32), bf16 refiner,
    # face-plan deformer is the r7/r8 measured-best parity block; this
    # round's levers are the exact tile cull (default ON) and presort
    ("parity-cull", dict(PARITY)),
    ("parity-cull-nops", dict(PARITY, presort=False)),
    ("parity-nocull", dict(PARITY, tile_cull=False)),
    ("parity-nocull-nops", dict(PARITY, tile_cull=False, presort=False)),
    ("parity-f32", dict(PARITY, bf16=False)),
    ("cull-tpglarge16", dict(PARITY, tpg_large=16)),
    ("cull-largek16k", dict(PARITY, large_k=16384)),
    ("cull-chunk64", dict(PARITY, chunk=64)),
    # streaming blend: payload-carrying sort + contiguous block DMAs
    # (replaces the row gather's ~53-61 ns/row descriptor floor)
    ("parity-stream", dict(PARITY, streaming=True)),
    ("parity-stream-chunk64", dict(PARITY, streaming=True, chunk=64)),
    ("parity-stream-chunk128", dict(PARITY, streaming=True, chunk=128)),
    # exact zero-truncation cap ladder (instances 391k -> 462k) with the
    # VMEM-resident classed table absorbing the big-splat row fetches
    ("vmem2-ladder", dict(PARITY, tpg=2, size_classes=LADDER, vmem_classes=2)),
    ("vmem2-chunk64", dict(PARITY, tpg=2, size_classes=LADDER,
                           vmem_classes=2, chunk=64)),
    ("vmem0-ladder", dict(PARITY, tpg=2, size_classes=LADDER)),
    # vmem on the legacy-shaped 2-class config expressed as a ladder
    ("vmem1-8k32", dict(PARITY, tpg=2, size_classes=((8192, 32),),
                        vmem_classes=1)),
]
QUICK = [0, 1, 2, 3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon", choices=["axon", "cpu", "tpu"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--uv", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--body-side", type=int, default=101)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run only variants whose label contains this "
                         "substring (e.g. 'stream')")
    ap.add_argument("--skip-probe", action="store_true",
                    help="caller already probed the tunnel")
    args = ap.parse_args()
    platform = "axon" if args.platform == "tpu" else args.platform

    from guava_renderer_tpu.utils.platform import probe_backend

    if platform == "axon" and not args.skip_probe:
        ok, detail = probe_backend(platform, timeout_s=150)
        if not ok:
            print(json.dumps({"metric": f"sweep skipped: {detail}", "value": 0.0,
                              "unit": "fps", "vs_baseline": 0.0}))
            return

    variants = [VARIANTS[i] for i in QUICK] if args.quick else VARIANTS
    if args.only:
        variants = [(l, kw) for l, kw in variants if args.only in l]
    best = (None, 0.0)
    for label, kw in variants:
        t0 = time.time()
        try:
            stats = run_bench(
                platform, args.frames, args.size, args.uv,
                kw["tile"], kw["chunk"], kw["tpg"], args.repeats,
                body_side=args.body_side, bf16=kw["bf16"],
                cost=False,  # sweep measures FPS only; bench.py owns MFU
                large_k=kw.get("large_k", 8192),
                tpg_large=kw.get("tpg_large", 32),
                instance_budget=kw.get("instance_budget"),
                dma_banks=kw.get("dma_banks", 1),
                face_plan=kw.get("face_plan", False),
                presort=kw.get("presort", True),
                tile_cull=kw.get("tile_cull", True),
                streaming=kw.get("streaming", False),
                size_classes=kw.get("size_classes", ()),
                vmem_classes=kw.get("vmem_classes", 0),
            )
            fps, P = stats["fps"], stats["P"]
        except Exception:
            traceback.print_exc()
            fps, P = 0.0, 0
        print(json.dumps({
            "metric": f"{label} @{args.size}px P={P}",
            "value": round(fps, 2), "unit": "fps",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
        if fps > best[1]:
            best = (label, fps)
    print(f"SUMMARY best={best[0]} fps={best[1]:.2f} "
          f"(vs {BASELINE_FPS:.0f} fps target: {best[1] / BASELINE_FPS:.2f}x)")


if __name__ == "__main__":
    main()
