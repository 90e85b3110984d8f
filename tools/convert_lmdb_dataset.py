"""Convert a reference GUAVA tracked dataset (LMDB images) into this
framework's RecordStore layout.

The tracking pkls/jsons are shared as-is; only the image store changes:
  img_lmdb/  (reference, ref: utils/lmdb.py:14-76)  ->  img_store.grv

Requires the `lmdb` package only at conversion time (it is not bundled in
TPU images; run this once wherever the dataset was produced).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guava_renderer_tpu.data.store import RecordStoreWriter  # noqa: E402


def convert(data_path: str, out_path: str | None = None) -> str:
    try:
        import lmdb
    except ImportError as e:
        raise SystemExit(
            "the lmdb package is required for conversion (pip install lmdb "
            "in the data-prep environment)"
        ) from e

    src = os.path.join(data_path, "img_lmdb")
    out = out_path or os.path.join(data_path, "img_store.grv")
    env = lmdb.open(src, readonly=True, lock=False, subdir=True)
    n = 0
    with env.begin() as txn, RecordStoreWriter(out) as w:
        for key, value in txn.cursor():
            w.put(key.decode(), bytes(value))
            n += 1
    env.close()
    print(f"converted {n} records -> {out}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, required=True)
    ap.add_argument("--out", type=str, default=None)
    convert(ap.parse_args().data_path, ap.parse_args().out)
