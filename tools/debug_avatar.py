"""Manual debug harness — the reference's debug_inferer/debug_assets/
debug_frame roles (ref: debug_inferer.py:14-86, debug_assets.py:12-60,
debug_frame.py:14-30): run the inferer on one record, print attribute
sanity statistics (min/max/mean of xyz/opacity/scale/color), and dump the
deformed Gaussians to PLY for inspection.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(name, x):
    x = np.asarray(x)
    finite = np.isfinite(x).all()
    print(
        f"  {name:16s} shape={tuple(x.shape)} min={x.min():+.4f} "
        f"max={x.max():+.4f} mean={x.mean():+.4f} finite={finite}"
    )
    if not finite:
        print(f"  !! {name} has {np.size(x) - np.isfinite(x).sum()} non-finite values")


def main(args):
    from guava_renderer_tpu.avatar.deformer import deform_avatar
    from guava_renderer_tpu.cli.context import build_runtime, init_params, resolve_config
    from guava_renderer_tpu.cli.inference import infer_avatar
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset
    from guava_renderer_tpu.train.pipeline import _unpack_params
    from guava_renderer_tpu.utils.ply import save_gaussian_ply

    cfg = resolve_config(args.model_path)
    rt = build_runtime(cfg, synthetic_assets=args.synthetic_assets)
    params = init_params(rt)["model"]

    ds = TrackedVideoDataset(
        args.data_path, "test",
        image_size=cfg.MODEL.image_size,
        feature_img_size=cfg.MODEL.feature_img_size,
        origin_image_size=cfg.DATASET.origin_image_size,
    )
    rec = ds[args.frame]
    avatar, extra = infer_avatar(rt, params, rec["source"], prune=not args.no_prune)

    print("== avatar attributes ==")
    stats("vtx_positions", avatar.vtx_positions)
    stats("vtx_opacity", avatar.vtx_opacity)
    stats("vtx_scales", avatar.vtx_scales)
    stats("vtx_colors", avatar.vtx_colors)
    stats("uv_local_xyz", avatar.uv_local_xyz)
    stats("uv_opacity", avatar.uv_opacity)
    stats("uv_scales", avatar.uv_scales)

    import jax.numpy as jnp

    body, flame = _unpack_params(
        {k: jnp.asarray(v)[None] for k, v in rec["target"]["params"].items()}
    )
    gs = deform_avatar(avatar, rt.ehm, rt.statics.faces, body, flame)
    print("== deformed gaussians ==")
    stats("xyz", gs.xyz)
    stats("scaling", gs.scaling)
    stats("rotation", gs.rotation)

    if args.dump_ply:
        save_gaussian_ply(
            args.dump_ply,
            np.asarray(gs.xyz[0]),
            np.asarray(gs.colors[0, :, :3]),
            np.asarray(gs.opacity[0]),
            np.asarray(gs.scaling[0]),
            np.asarray(gs.rotation[0]),
        )
        print(f"dumped {gs.xyz.shape[1]} gaussians to {args.dump_ply}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, default="assets/GUAVA")
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--dump_ply", type=str, default=None)
    parser.add_argument("--no_prune", action="store_true")
    parser.add_argument("--synthetic_assets", action="store_true")
    main(parser.parse_args())
