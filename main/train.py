"""Training entry point — CLI parity with the reference main/train.py.

    python main/train.py -c ubody_512 [-d auto] [--basemodel PATH] [--debug]

`-d` selects how many chips of the mesh to use ('auto' / an int / the
reference's '0,1' list form, whose length is taken).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_devices(spec: str) -> int | None:
    if spec in ("auto", "") or not any(c.isdigit() for c in spec):
        return None
    if "," in spec:
        return len([s for s in spec.split(",") if s != ""])
    # a bare index like '0' means one device (reference semantics)
    return 1 if spec.isdigit() and int(spec) < 8 else int(spec)


def train(config_name: str, basemodel: str | None, devices: str, debug: bool,
          synthetic_assets: bool = False, max_iters: int | None = None,
          platform: str | None = None, profile_dir: str | None = None):
    # Pin the backend in-process BEFORE any jax-importing module loads:
    # the container sitecustomize re-exports JAX_PLATFORMS=axon, so `-d cpu`
    # must win here, not via parent env (ref role: utils/general_utils.py
    # device_parser + CUDA_VISIBLE_DEVICES).
    from guava_renderer_tpu.utils.platform import normalize_device_arg, pin_platform

    pin_platform(platform or normalize_device_arg(devices))

    from guava_renderer_tpu.cli.context import build_runtime, resolve_config
    from guava_renderer_tpu.cli.trainer_loop import run_training
    from guava_renderer_tpu.data.tracked import build_dataset

    cfg = resolve_config(config_name)
    rt = build_runtime(cfg, synthetic_assets=synthetic_assets)

    train_ds = build_dataset(cfg, "train")
    valid_ds = build_dataset(cfg, "valid")

    run_dir = os.path.join(
        os.environ.get("GUAVA_OUTPUT_DIR", "outputs"), cfg.TRAIN.exp_str
    )
    run_training(
        rt, train_ds, valid_ds, run_dir,
        basemodel=basemodel, debug=debug, max_iters=max_iters,
        n_devices=parse_devices(devices),
        profile_dir=profile_dir,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_name", "-c", required=True, type=str)
    parser.add_argument("--devices", "-d", default="auto", type=str)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                        help="JAX backend (overrides -d; pinned in-process)")
    parser.add_argument("--basemodel", default=None, type=str)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--synthetic_assets", action="store_true")
    parser.add_argument("--max_iters", default=None, type=int)
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="write a jax.profiler trace of 3 steady-state iters here")
    args = parser.parse_args()
    print(f"Command Line Args: {args}")
    train(args.config_name, args.basemodel, args.devices, args.debug,
          args.synthetic_assets, args.max_iters,
          platform=args.platform, profile_dir=args.profile_dir)
