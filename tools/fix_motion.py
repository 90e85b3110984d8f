"""Inject custom motion coefficients into a tracked-video pickle.

Counterpart of the reference's fix_json.py (ref: fix_json.py:5-65), which
loads a reference `optim_tracking_ehm.pkl`, replaces each frame's
`smplx_coeffs` / `flame_coeffs` with those from a custom motion pickle
(frame-index aligned, extra frames dropped), and writes the result —
preserving cameras, crop matrices, and identity data. Paths are CLI
arguments instead of the reference's hard-coded personal paths.

    python tools/fix_motion.py \
        --reference .../optim_tracking_ehm.pkl \
        --custom .../optim_tracking_custom.pkl \
        --output .../optim_tracking_ehm_fixed.pkl
"""

import argparse
import copy
import os
import pickle

KEYS = ("smplx_coeffs", "flame_coeffs")


def fix_motion(reference_path: str, custom_path: str, output_path: str,
               keys=KEYS) -> int:
    with open(reference_path, "rb") as f:
        reference = pickle.load(f)
    with open(custom_path, "rb") as f:
        custom = pickle.load(f)

    fixed = copy.deepcopy(reference)
    ref_frames = sorted(reference.keys())
    custom_frames = sorted(custom.keys())
    n = min(len(ref_frames), len(custom_frames))
    print(f"reference: {len(ref_frames)} frames, custom: {len(custom_frames)}"
          f" -> injecting {n}")

    for i in range(n):
        dst, src = ref_frames[i], custom_frames[i]
        for k in keys:
            if k in custom[src]:
                fixed[dst][k] = custom[src][k]

    out_dir = os.path.dirname(output_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(output_path, "wb") as f:
        pickle.dump(fixed, f)
    print(f"wrote {output_path}")
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", required=True,
                    help="tracked pkl providing cameras/identity/structure")
    ap.add_argument("--custom", required=True,
                    help="pkl providing per-frame smplx/flame coefficients")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    fix_motion(args.reference, args.custom, args.output)


if __name__ == "__main__":
    main()
