"""Inference/eval entry point — CLI parity with the reference main/test.py.

Modes: self-reenactment (default), --render_cross_act,
--render_dynamic_novel_views, --render_static_novel_views.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test(args):
    import numpy as np

    from guava_renderer_tpu.cli.context import build_runtime, init_params, resolve_config
    from guava_renderer_tpu.cli.inference import (
        render_cross_set,
        render_novel_views,
        render_set,
    )
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset
    from guava_renderer_tpu.train.checkpoints import CheckpointManager
    from guava_renderer_tpu.train.trainstep import TrainState

    cfg = resolve_config(args.config_name or args.model_path)
    rt = build_runtime(cfg, synthetic_assets=args.synthetic_assets)

    params = init_params(rt)["model"]
    if args.model_path and os.path.isdir(os.path.join(args.model_path, "checkpoints")):
        cm = CheckpointManager(args.model_path)
        found = cm.find_checkpoint()
        if found:
            import jax.numpy as jnp

            state = TrainState(params, None, jnp.asarray(0))
            # restore params only (optimizer state not saved at inference time)
            restored, it = cm.restore(
                TrainState(params, cm_opt_placeholder(params), jnp.asarray(0))
            )
            params = restored.params
            print(f"restored checkpoint {found} @ iter {it}")
    else:
        print("[test] no checkpoint found — running with random weights")

    def make_ds(path):
        return TrackedVideoDataset(
            path, "test",
            image_size=cfg.MODEL.image_size,
            feature_img_size=cfg.MODEL.feature_img_size,
            origin_image_size=cfg.DATASET.origin_image_size,
        )

    save_path = args.save_path or os.path.join(args.model_path or ".", "test_results")
    ds = make_ds(args.data_path)

    if args.render_cross_act:
        src_ds = make_ds(args.source_data_path or args.data_path)
        render_cross_set(
            rt, params, src_ds, ds,
            os.path.join(save_path, "cross"),
            keep_source_cam=args.keep_source_cam,
            max_frames=args.max_frames,
        )
    elif args.render_dynamic_novel_views or args.render_static_novel_views:
        for idx in args.render_snovel_idx:
            render_novel_views(
                rt, params, ds,
                os.path.join(save_path, f"novel_{idx}"),
                static=args.render_static_novel_views,
                frame_idx=idx,
            )
    elif not args.skip_self_act:
        results = render_set(
            rt, params, ds, save_path, saving_name=args.saving_name,
            max_frames=args.max_frames,
        )
        print(results)


def cm_opt_placeholder(params):
    from guava_renderer_tpu.train.trainstep import make_optimizer

    return make_optimizer(params).init(params)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_name", "-c", default=None, type=str)
    parser.add_argument("--devices", "-d", default="0", type=str)
    parser.add_argument("--basemodel", "-b", default=None, type=str)
    parser.add_argument("--data_path", type=str)
    parser.add_argument("--model_path", "-m", type=str)
    parser.add_argument("--save_path", "-s", type=str, default=None)
    parser.add_argument("--saving_name", "-n", type=str, default="render")
    parser.add_argument("--non_test_full", action="store_true", default=False)
    parser.add_argument("--skip_self_act", action="store_true", default=False)
    parser.add_argument("--render_dynamic_novel_views", action="store_true", default=False)
    parser.add_argument("--render_static_novel_views", action="store_true", default=False)
    parser.add_argument("--render_snovel_idx", nargs="+", type=int, default=[0])
    parser.add_argument("--render_cross_act", action="store_true", default=False)
    parser.add_argument("--keep_source_cam", action="store_true", default=False)
    parser.add_argument("--source_data_path", type=str, default=None,
                        help="source info for cross_reenactment")
    parser.add_argument("--synthetic_assets", action="store_true")
    parser.add_argument("--max_frames", default=None, type=int)
    args = parser.parse_args()
    test(args)
