"""Resample a motion npz between frame rates — CLI parity with the
reference resample_motion.py (linear interpolation, e.g. 25 <-> 30 fps)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guava_renderer_tpu.motion import resample_motion  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--src_fps", type=float, required=True)
    parser.add_argument("--dst_fps", type=float, required=True)
    args = parser.parse_args()

    data = np.load(args.input, allow_pickle=True)
    motion = {k: np.asarray(data[k]) for k in data.files}
    out = resample_motion(motion, args.src_fps, args.dst_fps)
    np.savez(args.output, **{k: v for k, v in out.items() if isinstance(v, np.ndarray)})
    print(f"resampled {args.src_fps} -> {args.dst_fps} fps: {args.output}")
