"""Convert external motion files (EMAGE SMPL-X npz / ARTalk FLAME tracks)
into the framework's motion dict — CLI parity with the reference
convert_motion.py (without its hard-coded personal paths)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guava_renderer_tpu.motion import (  # noqa: E402
    load_flame_motion,
    load_smplx_motion,
    resample_motion,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--smplx_motion", type=str, default=None)
    parser.add_argument("--flame_motion", type=str, default=None)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--src_fps", type=float, default=None)
    parser.add_argument("--dst_fps", type=float, default=30.0)
    args = parser.parse_args()

    out = {}
    if args.smplx_motion:
        m = load_smplx_motion(args.smplx_motion)
        fps = args.src_fps or m.get("fps", args.dst_fps)
        m = resample_motion(m, fps, args.dst_fps)
        out.update({f"smplx/{k}": v for k, v in m.items() if isinstance(v, np.ndarray)})
    if args.flame_motion:
        f = load_flame_motion(args.flame_motion)
        if args.src_fps:
            f = resample_motion(f, args.src_fps, args.dst_fps)
        out.update({f"flame/{k}": v for k, v in f.items() if isinstance(v, np.ndarray)})
    out["fps"] = np.asarray(args.dst_fps)
    np.savez(args.output, **out)
    print(f"wrote {args.output}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))
