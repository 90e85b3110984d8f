"""Inspect motion/tracking files (the reference's inspect_motion_files.py /
debug_data.py role): print structure, shapes and dtypes of npz/npy/pkl."""

import argparse
import pickle

import numpy as np


def describe(obj, prefix="", depth=0):
    pad = "  " * depth
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)):
                print(f"{pad}{k}:")
                describe(v, depth=depth + 1)
            else:
                describe(v, prefix=f"{k}: ", depth=depth)
    elif isinstance(obj, (list, tuple)):
        print(f"{pad}{prefix}list[{len(obj)}]")
        if obj:
            describe(obj[0], depth=depth + 1)
    elif isinstance(obj, np.ndarray):
        print(f"{pad}{prefix}ndarray{obj.shape} {obj.dtype} "
              f"[{np.nanmin(obj) if obj.size else '-'}, "
              f"{np.nanmax(obj) if obj.size else '-'}]")
    else:
        print(f"{pad}{prefix}{type(obj).__name__} = {obj!r}"[:120])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    for path in ap.parse_args().files:
        print(f"== {path} ==")
        if path.endswith((".npz",)):
            data = np.load(path, allow_pickle=True)
            describe({k: data[k] for k in data.files})
        elif path.endswith(".npy"):
            describe(np.load(path, allow_pickle=True))
        elif path.endswith(".pkl"):
            with open(path, "rb") as f:
                describe(pickle.load(f))
        else:
            print("  (unknown format)")
