"""Compile-prove the FULL-SIZE ubody_512 training step (VERDICT r2 item 7).

Builds the real `configs/train/ubody_512.yaml` runtime on full-scale
synthetic assets, assembles one real loader batch at full shapes, and AOT
lowers + compiles the shard_map train step — WITHOUT running 200k iters.
On CPU this flushes tracing/shape bugs at 512^2; on the real chip it is the
authoritative Mosaic/VMEM pressure check for the backward rasterizer kernel
(512^2, chunk 32) that interpret-mode tests cannot give.

    python tools/compile_train_512.py --platform axon   # on-chip proof
    python tools/compile_train_512.py --platform cpu    # shape/trace proof

Prints one status line per stage and a final COMPILE OK/FAIL; with
--execute also runs one real step (slow on CPU).

Reference role: the first optimization iteration of main/trainer.py
(ref: main/trainer.py:60-101) at the paper config's full resolution.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_accum(args, t0, pstep, state, batch, mesh):
    """Accum mode: AOT-compile the batch-1 grad program, then (--execute)
    run full accumulated steps — B grad calls + acc + apply per step —
    reporting per-step and per-sample wall time."""
    import sys
    import time

    import jax
    import jax.numpy as jnp

    B = args.batch_size
    microbatches = [
        jax.tree_util.tree_map(
            lambda x, i=i: x[i:i + 1]
            if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
            batch)
        for i in range(B)
    ]

    tc = time.time()
    try:
        lowered = pstep.lower_grad(state, microbatches[0])
        txt_len = len(lowered.as_text())
        print(f"[{time.time()-t0:7.1f}s] grad lowered (trace "
              f"{time.time()-tc:.1f}s, mlir {txt_len/1e6:.1f} MB)")
        tc = time.time()
        compiled = lowered.compile()
        print(f"[{time.time()-t0:7.1f}s] GRAD COMPILE OK "
              f"({time.time()-tc:.1f}s) on {jax.devices()[0].platform}")
    except Exception as e:  # noqa: BLE001
        print(f"COMPILE FAIL: {type(e).__name__}: {str(e)[:2000]}")
        sys.exit(1)
    try:
        ma = compiled.memory_analysis()
        print(f"  grad program: argument {ma.argument_size_in_bytes/2**30:.2f}"
              f" GiB, output {ma.output_size_in_bytes/2**30:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB")
    except Exception:
        pass

    if not args.execute:
        return
    for it in range(3):
        te = time.time()
        state, loss, metrics = pstep(state, microbatches)
        loss = float(loss)
        dt = time.time() - te
        label = ("STEP OK (accum) " if it == 0 else
                 f"step {it + 1}:         ")
        print(f"[{time.time()-t0:7.1f}s] {label}loss={loss:.4f} "
              f"({dt:.1f}s = {dt / B:.2f}s/sample, effective batch {B})")
        if it == 0:
            print("  metrics: " + " ".join(
                f"{k}={float(v):.4g}" for k, v in sorted(metrics.items())))
        assert jnp.isfinite(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon", choices=["cpu", "axon", "tpu"])
    ap.add_argument("--config", default="configs/train/ubody_512.yaml")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="per-chip batch (paper runs 6 over 2 GPUs; one chip"
                         " compiles the same kernels at any batch)")
    ap.add_argument("--execute", action="store_true",
                    help="also run one real step after compiling")
    ap.add_argument("--sample-scan", action="store_true",
                    help="per-sample gradient accumulation (lax.scan): the "
                         "XLA TPU compiler crashes on any batch>=2 512^2 "
                         "step; this keeps the program batch-1-shaped")
    ap.add_argument("--accum", action="store_true",
                    help="host-loop gradient accumulation: every COMPILED "
                         "program is batch-1 (grad/acc/apply split) — the "
                         "only decomposition the TPU compile service "
                         "accepts at 512^2 (batch>=2 data arrays crash it "
                         "even under lax.scan); effective batch = "
                         "--batch-size")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized forward (memory-vs-compute lever)")
    ap.add_argument("--dataset-dir", default="/tmp/guava_full_ds")
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import yaml

    from guava_renderer_tpu.cli.context import build_runtime, init_params
    from guava_renderer_tpu.data.loader import PrefetchLoader
    from guava_renderer_tpu.data.synthetic import write_synthetic_dataset
    from guava_renderer_tpu.data.tracked import build_dataset
    from guava_renderer_tpu.parallel.mesh import (
        data_parallel_mesh, replicate, shard_batch,
    )
    from guava_renderer_tpu.train.pipeline import make_loss_fn
    from guava_renderer_tpu.train.trainstep import (
        TrainState, make_optimizer, make_parallel_train_step,
    )
    from guava_renderer_tpu.utils.config import ConfigDict

    t0 = time.time()
    with open(args.config) as f:
        raw = yaml.safe_load(f)
    origin = int(raw["DATASET"]["origin_image_size"])
    # enough train frames for one full batch after the train/valid split
    # (a too-small dataset makes the loader yield nothing -> StopIteration)
    n_frames = max(4, 2 * args.batch_size + 2)
    # key the cached dataset on every shape-determining config value —
    # reusing a 512-config dataset for the micro config (same n_frames)
    # feeds stale coeff dims into the EHM and the trace fails
    n_shape = int(raw["MODEL"].get("synthetic_n_shape", 50))
    n_exp = int(raw["MODEL"].get("synthetic_n_exp", 20))
    ds_dir = (f"{args.dataset_dir}_f{n_frames}_o{origin}"
              f"_s{n_shape}_e{n_exp}")
    if not os.path.exists(os.path.join(ds_dir, "videos_info.json")):
        write_synthetic_dataset(
            ds_dir, n_videos=1, n_frames=n_frames, image_size=origin,
            n_shape=n_shape, n_exp=n_exp,
        )
    raw["DATASET"]["data_path"] = ds_dir
    raw["TRAIN"]["batch_size"] = args.batch_size
    cfg = ConfigDict(raw)
    print(f"[{time.time()-t0:7.1f}s] dataset + config ready (origin {origin})")

    rt = build_runtime(cfg, synthetic_assets=True)
    params = init_params(rt)
    print(f"[{time.time()-t0:7.1f}s] runtime built "
          f"(image {rt.statics.image_size}^2)")

    loss_fn = make_loss_fn(rt.statics, params["lpips"], remat=args.remat)
    optimizer = make_optimizer(
        params["model"],
        learning_rate=float(cfg.OPTIMIZE.learning_rate),
        lr_decay_rate=float(cfg.OPTIMIZE.lr_decay_rate),
        lr_decay_iter=int(cfg.OPTIMIZE.lr_decay_iter),
    )
    mesh = data_parallel_mesh(1)
    if args.accum:
        from guava_renderer_tpu.train.trainstep import make_accum_train_step
        pstep = make_accum_train_step(loss_fn, optimizer, mesh)
    else:
        pstep = make_parallel_train_step(loss_fn, optimizer, mesh,
                                         sample_scan=args.sample_scan)

    ds = build_dataset(cfg, "train")
    loader = PrefetchLoader(ds, args.batch_size, shuffle=False)
    batch = shard_batch(next(iter(loader)), mesh)
    state = replicate(
        TrainState(params["model"], optimizer.init(params["model"]),
                   jnp.asarray(0)),
        mesh,
    )
    shapes = {k: tuple(v.shape) for k, v in list(batch.items())[:4]
              if hasattr(v, "shape")}
    print(f"[{time.time()-t0:7.1f}s] batch ready {shapes} ...")

    if args.accum:
        _run_accum(args, t0, pstep, state, batch, mesh)
        return

    tc = time.time()
    try:
        lowered = pstep.lower(state, batch)
        txt = lowered.as_text()
        import re as _re
        dense = sorted(
            ((len(m.group(0)), m.group(1)) for m in _re.finditer(
                r"dense<[^>]*> : (tensor<[^>]*>)", txt)),
            reverse=True)[:5]
        print(f"[{time.time()-t0:7.1f}s] lowered (trace {time.time()-tc:.1f}s, "
              f"mlir {len(txt)/1e6:.1f} MB, top dense consts "
              f"{[(d // 1000, t) for d, t in dense]} kB)")
        del txt
        tc = time.time()
        compiled = lowered.compile()
        print(f"[{time.time()-t0:7.1f}s] COMPILE OK ({time.time()-tc:.1f}s) "
              f"on {jax.devices()[0].platform}")
    except Exception as e:  # noqa: BLE001
        print(f"COMPILE FAIL: {type(e).__name__}: {str(e)[:2000]}")
        sys.exit(1)

    try:
        ma = compiled.memory_analysis()
        print(f"  argument {ma.argument_size_in_bytes/2**30:.2f} GiB, "
              f"output {ma.output_size_in_bytes/2**30:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB")
    except Exception:
        pass

    if args.execute:
        te = time.time()
        consts = getattr(pstep, 'consts', lambda: ())()
        state2, loss, metrics = compiled(state, batch, *consts)
        del state  # donated; also frees the pre-step copy on chip
        loss = float(loss)
        print(f"[{time.time()-t0:7.1f}s] STEP OK loss={loss:.4f} "
              f"({time.time()-te:.1f}s)")
        print("  metrics: " + " ".join(
            f"{k}={float(v):.4g}" for k, v in sorted(metrics.items())))
        te = time.time()
        state3, loss2, _ = compiled(state2, batch, *consts)
        print(f"  second step: loss={float(loss2):.4g} ({time.time()-te:.1f}s)")
        te = time.time()
        _, loss3, _ = compiled(state3, batch, *consts)
        print(f"  third step:  loss={float(loss3):.4g} ({time.time()-te:.1f}s)")
        assert jnp.isfinite(loss)


if __name__ == "__main__":
    main()
