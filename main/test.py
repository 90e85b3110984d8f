"""Inference/eval entry point — CLI parity with the reference main/test.py.

Modes: self-reenactment (default), --render_cross_act,
--render_dynamic_novel_views, --render_static_novel_views.

Weight discovery order (ref: main/test.py:242-252 best*/latest* +
find_pt_file, utils/general_utils.py:310-314):
  1. Orbax checkpoints under <model_path>/checkpoints (best > latest)
  2. converted reference weights <model_path>/converted_params.msgpack
     (produced by tools/convert_guava_checkpoint.py from best_*.pt)
Running on random weights requires --allow_random_weights (the reference
hard-requires trained weights; silent random inference was a round-1 bug).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test(args):
    from guava_renderer_tpu.utils.platform import normalize_device_arg, pin_platform

    pin_platform(args.platform or normalize_device_arg(args.devices),
                 host_devices=args.host_devices)

    from guava_renderer_tpu.cli.context import (
        build_runtime,
        load_model_params,
        resolve_config,
    )
    from guava_renderer_tpu.cli.inference import (
        render_cross_set,
        render_novel_views,
        render_set,
    )
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset
    from guava_renderer_tpu.utils.logging_utils import profiler_trace

    cfg = resolve_config(args.config_name or args.model_path)
    if args.bf16:
        cfg.set_readonly(False)
        cfg.MODEL.bf16_refiner = True
        cfg.set_readonly(True)
    rt = build_runtime(cfg, synthetic_assets=args.synthetic_assets)

    params, source = load_model_params(
        rt, args.model_path, args.basemodel,
        allow_random=args.allow_random_weights or args.synthetic_assets,
    )
    print(f"[test] weights: {source}")

    def make_ds(path):
        return TrackedVideoDataset(
            path, "test",
            image_size=cfg.MODEL.image_size,
            feature_img_size=cfg.MODEL.feature_img_size,
            origin_image_size=cfg.DATASET.origin_image_size,
            test_full=args.non_test_full,
        )

    save_path = args.save_path or os.path.join(args.model_path or ".", "test_results")
    ds = make_ds(args.data_path)

    with profiler_trace(args.profile_dir):
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
                max_frames=args.max_frames, dp_frames=args.dp_render,
                group_frames=args.group_frames,
            )
            print(results)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_name", "-c", default=None, type=str)
    parser.add_argument("--devices", "-d", default="0", type=str)
    parser.add_argument("--host_devices", type=int, default=None,
                        help="force N virtual host devices (CPU testing of "
                             "the data-parallel paths)")
    parser.add_argument("--dp_render", action="store_true",
                        help="render frames data-parallel over all local "
                             "devices (one avatar, poses sharded)")
    parser.add_argument("--group_frames", type=int, default=0,
                        help="render G frames per device call through the "
                             "grouped two-phase (prep xG then blend xG) "
                             "program — single-chip throughput at G frames "
                             "of latency")
    parser.add_argument("--bf16", action="store_true",
                        help="run the neural refiner in bfloat16 (TPU serving)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                        help="JAX backend (overrides -d; pinned in-process)")
    parser.add_argument("--basemodel", "-b", default=None, type=str,
                        help="explicit checkpoint path to restore")
    parser.add_argument("--data_path", type=str)
    parser.add_argument("--model_path", "-m", type=str)
    parser.add_argument("--save_path", "-s", type=str, default=None)
    parser.add_argument("--saving_name", "-n", type=str, default="render")
    parser.add_argument("--non_test_full", action="store_true", default=False,
                        help="render every frame instead of the testing_split tail")
    parser.add_argument("--skip_self_act", action="store_true", default=False)
    parser.add_argument("--render_dynamic_novel_views", action="store_true", default=False)
    parser.add_argument("--render_static_novel_views", action="store_true", default=False)
    parser.add_argument("--render_snovel_idx", nargs="+", type=int, default=[0])
    parser.add_argument("--render_cross_act", action="store_true", default=False)
    parser.add_argument("--keep_source_cam", action="store_true", default=False)
    parser.add_argument("--source_data_path", type=str, default=None,
                        help="source info for cross_reenactment")
    parser.add_argument("--synthetic_assets", action="store_true")
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="permit inference from random init (debug only)")
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="write a jax.profiler trace of the run here")
    args = parser.parse_args()
    test(args)
