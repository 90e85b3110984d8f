"""Single-image avatar creation — CLI parity with the reference
create_avatar.py (ref: create_avatar.py:14-86): config + checkpoint ->
one-shot inference -> pruned avatar serialized (orbax PyTree instead of
torch.save) + 3DGS PLY export.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def create_avatar(args):
    from guava_renderer_tpu.utils.platform import normalize_device_arg, pin_platform

    pin_platform(args.platform or normalize_device_arg(args.devices))

    import numpy as np

    from guava_renderer_tpu.avatar.deformer import canonical_gaussians
    from guava_renderer_tpu.cli.context import (
        build_runtime,
        load_model_params,
        resolve_config,
    )
    from guava_renderer_tpu.cli.inference import FramePipeline
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset
    from guava_renderer_tpu.train.checkpoints import save_pytree
    from guava_renderer_tpu.utils.ply import save_gaussian_ply

    cfg = resolve_config(args.model_path)
    rt = build_runtime(cfg, synthetic_assets=args.synthetic_assets)
    params, source = load_model_params(
        rt, args.model_path,
        allow_random=args.allow_random_weights or args.synthetic_assets,
    )
    print(f"[create_avatar] weights: {source}")

    ds = TrackedVideoDataset(
        args.data_path, "test",
        image_size=cfg.MODEL.image_size,
        feature_img_size=cfg.MODEL.feature_img_size,
        origin_image_size=cfg.DATASET.origin_image_size,
    )
    idx = 0
    if args.source_video_id:
        for i, key in enumerate(ds.frames):
            if key.startswith(args.source_video_id):
                idx = i
                break
    rec = ds[idx]

    # warm-up (compile), then timed (the "sub-second" claim's measurement)
    pipe = FramePipeline(rt, params)
    pipe.infer_avatar(rec["source"])
    t0 = time.time()
    avatar, _ = pipe.infer_avatar(rec["source"])
    import jax

    jax.block_until_ready(avatar.uv_colors)
    print(f"avatar inference: {(time.time() - t0) * 1000:.1f} ms")

    save_pytree(args.output_avatar_path, avatar._asdict())
    gs = canonical_gaussians(avatar, rt.statics.faces)
    save_gaussian_ply(
        os.path.splitext(args.output_avatar_path)[0] + ".ply",
        np.asarray(gs.xyz[0]),
        np.asarray(gs.colors[0, :, :3]),
        np.asarray(gs.opacity[0]),
        np.asarray(gs.scaling[0]),
        np.asarray(gs.rotation[0]),
    )
    print(f"saved avatar to {args.output_avatar_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, default="assets/GUAVA")
    parser.add_argument("--data_path", type=str,
                        default="assets/example/tracked_video/6gvP8f5WQyo__056")
    parser.add_argument("--source_video_id", type=str, default="6gvP8f5WQyo__056")
    parser.add_argument("--output_avatar_path", type=str, default="my_avatar")
    parser.add_argument("--devices", "-d", default="0", type=str)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    parser.add_argument("--allow_random_weights", action="store_true")
    parser.add_argument("--synthetic_assets", action="store_true")
    args = parser.parse_args()
    create_avatar(args)
