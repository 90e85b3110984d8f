"""Offline metrics driver — CLI parity with the reference main/metrics.py
(ref: main/metrics.py:84-193): walks each model path's scene directories
(render/ + gt/ PNG dumps from main/test.py), computes PSNR/SSIM/LPIPS/MAE
per view, writes per_view.json + results.json per scene and an aggregate
results.json per model path.

LPIPS uses the VGG variant like the reference (LPIPS('vgg','0.1')); the
backbone loads converted weights from assets/pretrained/lpips_vgg.msgpack
when present, otherwise the LPIPS column is skipped (random-backbone LPIPS
numbers would be meaningless for reporting).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_lpips(pretrained_dir: str):
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_restore

    from guava_renderer_tpu.train.lpips import LPIPS
    from guava_renderer_tpu.train.weights import merge_params

    path = os.path.join(pretrained_dir, "lpips_vgg.msgpack")
    if not os.path.isfile(path):
        print(f"[metrics] no converted LPIPS-vgg at {path} — skipping LPIPS")
        return None
    m = LPIPS(net_type="vgg")
    x0 = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x0, x0)
    with open(path, "rb") as f:
        params = {"params": merge_params(params["params"], msgpack_restore(f.read()),
                                         require_all=True)}
    fn = jax.jit(lambda a, b: m.apply(params, a, b))
    print(f"[metrics] LPIPS-vgg loaded from {path}")
    return fn


def main():
    ap = argparse.ArgumentParser(description="Offline render metrics")
    ap.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--pretrained_dir", default="assets/pretrained")
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(args.platform)

    from guava_renderer_tpu.train.metrics import evaluate_tree

    lpips_fn = build_lpips(args.pretrained_dir)
    for root in args.model_paths:
        out = evaluate_tree(root, lpips_fn=lpips_fn)
        print(f"--- {root} ---")
        print(json.dumps(out["aggregate"], indent=2))


if __name__ == "__main__":
    main()
