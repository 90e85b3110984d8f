"""Render a saved avatar with external motion — CLI parity with the
reference render_motion.py (ref: render_motion.py:85-456): saved avatar +
trained refiner checkpoint (hard-required, ref :109), SMPL-X npz (EMAGE)
and/or FLAME (ARTalk) motion, optional fps resampling, static look-at
camera, per-frame deform+render at 512/720/1080/2048 to MP4 with optional
audio mux (requires ffmpeg on PATH).

The per-frame path is one jitted device call reused across frames
(FramePipeline); --image_size re-rasterizes at the chosen resolution while
the refiner runs at its trained size (see GaussianRenderer.refiner_size).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def render_motion(args):
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(args.platform)

    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.cli.context import (
        build_runtime,
        load_model_params,
        resolve_config,
    )
    from guava_renderer_tpu.cli.inference import FramePipeline, _write_video
    from guava_renderer_tpu.motion import (
        load_flame_motion,
        load_smplx_motion,
        motion_frame_params,
        resample_motion,
    )
    from guava_renderer_tpu.train.checkpoints import load_pytree
    from guava_renderer_tpu.utils.camera_orbit import look_at_w2c

    cfg = resolve_config(args.model_path)
    if int(args.image_size) != int(cfg.MODEL.image_size) or args.bf16:
        cfg.set_readonly(False)
        cfg.MODEL.image_size = int(args.image_size)
        if args.bf16:
            cfg.MODEL.bf16_refiner = True
        cfg.set_readonly(True)
    rt = build_runtime(cfg, synthetic_assets=args.synthetic_assets)

    params, source = load_model_params(
        rt, args.model_path,
        allow_random=args.allow_random_weights or args.synthetic_assets,
    )
    print(f"[render_motion] weights: {source}")

    avatar_dict = load_pytree(args.avatar_path, None)
    avatar = GaussianAvatar(**{k: jnp.asarray(v) for k, v in avatar_dict.items()})

    smplx_motion = load_smplx_motion(args.smplx_motion) if args.smplx_motion else None
    flame_motion = load_flame_motion(args.flame_motion) if args.flame_motion else None
    assert smplx_motion is not None, "--smplx_motion is required"
    src_fps = smplx_motion.get("fps", args.src_fps)
    if src_fps != args.fps:
        smplx_motion = resample_motion(smplx_motion, src_fps, args.fps)

    w2c = look_at_w2c(
        np.pi / 2, np.pi / 2 - 0.05, np.asarray([0.0, 0.75, 0.0]), radius=args.cam_radius
    )

    pipe = FramePipeline(rt, params)
    n = smplx_motion["body_pose"].shape[0]
    if args.max_frames:
        n = min(n, args.max_frames)
    frames = []
    n_shape = rt.smplx.n_shape
    n_exp = rt.smplx.n_exp
    for t in range(n):
        p = motion_frame_params(
            smplx_motion, flame_motion, t,
            n_shape=n_shape, n_exp=n_exp,
            hand_pose_scale=args.hand_pose_scale,
        )
        # motion_frame_params returns batched (1, ...) arrays; the pipeline
        # batches records itself
        p = {k: np.asarray(v)[0] for k, v in p.items()}
        out = pipe.render_frame(avatar, {"params": p, "w2c": w2c})
        frames.append(np.asarray(out["render"]))
    out_path = args.output or "motion_render.mp4"
    _write_video(out_path, frames, fps=int(args.fps))
    print(f"wrote {len(frames)} frames to {out_path} at {args.image_size}px")

    if args.audio and os.path.exists(args.audio):
        muxed = os.path.splitext(out_path)[0] + "_audio.mp4"
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-i", out_path, "-i", args.audio,
                 "-c:v", "copy", "-c:a", "aac", "-shortest", muxed],
                check=True, capture_output=True,
            )
            print(f"audio muxed -> {muxed}")
        except (FileNotFoundError, subprocess.CalledProcessError) as e:
            print(f"audio mux skipped ({e})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--avatar_path", "-a", type=str, required=True)
    parser.add_argument("--model_path", "-m", type=str, default="assets/GUAVA")
    parser.add_argument("--smplx_motion", type=str, default=None,
                        help="EMAGE-style npz with poses (T,165)")
    parser.add_argument("--flame_motion", type=str, default=None,
                        help="ARTalk-style FLAME exp/jaw track")
    parser.add_argument("--audio", type=str, default=None)
    parser.add_argument("--output", "-o", type=str, default=None)
    parser.add_argument("--fps", type=float, default=30.0)
    parser.add_argument("--src_fps", type=float, default=30.0)
    parser.add_argument("--cam_radius", type=float, default=5.0)
    parser.add_argument("--hand_pose_scale", type=float, default=1.0)
    parser.add_argument("--image_size", type=int, default=512,
                        help="output resolution (rasterized natively; refiner "
                             "runs at its trained size). The reference "
                             "supports 512/720/1080/2048; any size works here")
    parser.add_argument("--no_refiner", action="store_true",
                        help="kept for CLI parity (the reference flag is a no-op, "
                             "render_motion.py:116-118)")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="run the neural refiner in bfloat16 (TPU serving)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    parser.add_argument("--allow_random_weights", action="store_true")
    parser.add_argument("--synthetic_assets", action="store_true")
    args = parser.parse_args()
    render_motion(args)
