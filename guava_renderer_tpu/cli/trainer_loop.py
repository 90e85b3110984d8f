"""Training driver (the reference Trainer's role, main/trainer.py:13-301).

Run layout per iteration: batch -> DP train step (shard_map over the chip
mesh) -> moving-average logging; every visual_interval a GT/render image
grid; every check_interval validation (PSNR/SSIM, mesh-wide mean) + latest
checkpoint + best-SSIM checkpoint; source snapshot of configs into the run
dir (ref: trainer.py:276-294 snapshots code; we snapshot config + git rev).
"""

from __future__ import annotations

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import PrefetchLoader, endless
from ..ops.ssim import psnr, ssim
from ..parallel.mesh import data_parallel_mesh, replicate, shard_batch
from ..train.checkpoints import CheckpointManager
from ..train.pipeline import forward_pipeline, make_loss_fn
from ..train.trainstep import (
    TrainState,
    make_optimizer,
    make_parallel_eval_step,
    make_parallel_train_step,
)
from ..utils.logging_utils import MovingAverageMeter, SpeedMeter, build_logger
from .context import Runtime, init_params


def _save_grid(path: str, rows: list[np.ndarray]) -> None:
    import cv2

    grid = np.concatenate([np.concatenate(list(r), axis=1) for r in rows], axis=0)
    grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def _snapshot_run(run_dir: str, rt: Runtime) -> None:
    os.makedirs(run_dir, exist_ok=True)
    rt.cfg._dump(os.path.join(run_dir, "config.yaml"))
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
        with open(os.path.join(run_dir, "git_rev.txt"), "w") as f:
            f.write(rev + "\n")
    except Exception:
        pass
    # full per-run source snapshot (ref: main/trainer.py:276-294 archives
    # every .py/.yaml into outputs/.../codes): copy the package + drivers +
    # configs so a run is reproducible without the git checkout.
    try:
        import shutil

        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        codes = os.path.join(run_dir, "codes")
        if os.path.isdir(codes):
            shutil.rmtree(codes)
        for sub in ("guava_renderer_tpu", "main", "configs", "tools"):
            src = os.path.join(repo, sub)
            if os.path.isdir(src):
                shutil.copytree(
                    src, os.path.join(codes, sub),
                    ignore=shutil.ignore_patterns(
                        "__pycache__", "*.pyc", "*.so", "*.o", "*.npz", "*.msgpack"
                    ),
                )
        for f in ("bench.py", "create_avatar.py", "render_motion.py", "app.py"):
            src = os.path.join(repo, f)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(codes, f))
    except Exception as e:  # snapshot failure must never kill training
        print(f"[trainer] codes snapshot failed: {e}")


def run_training(
    rt: Runtime,
    train_ds,
    valid_ds,
    run_dir: str,
    basemodel: str | None = None,
    debug: bool = False,
    max_iters: int | None = None,
    n_devices: int | None = None,
    profile_dir: str | None = None,
):
    cfg = rt.cfg
    logger = build_logger("train", run_dir)
    _snapshot_run(run_dir, rt)
    vis_dir = os.path.join(run_dir, "visuals_training", "train_render")
    os.makedirs(vis_dir, exist_ok=True)

    mesh = data_parallel_mesh(n_devices)
    n_dev = mesh.devices.size
    batch_size = int(cfg.TRAIN.batch_size)
    if batch_size % n_dev:
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        logger.info(f"batch_size rounded to {batch_size} for {n_dev} devices")

    params_all = init_params(rt)
    lpips_params = params_all["lpips"]
    params = params_all["model"]

    optimizer = make_optimizer(
        params,
        learning_rate=float(cfg.OPTIMIZE.learning_rate),
        lr_decay_rate=float(cfg.OPTIMIZE.lr_decay_rate),
        lr_decay_iter=int(cfg.OPTIMIZE.lr_decay_iter),
    )
    ckpts = CheckpointManager(run_dir)
    init_iter = 1
    state = TrainState(params, optimizer.init(params), jnp.asarray(0))
    if basemodel:
        state, init_iter = ckpts.restore(state, basemodel)
        logger.info(f"warm start from {basemodel} at iter {init_iter}")

    loss_fn = make_loss_fn(rt.statics, lpips_params,
                           remat=bool(cfg.TRAIN.get('remat', False)))
    # host-accum mode (TRAIN.host_accum): every compiled program stays
    # batch-n_dev (1/device) and the microbatch loop runs on the host —
    # the only decomposition the remote TPU compile service accepts for
    # 512^2 steps with batch >= 2 (train/trainstep.py:201). Effective
    # batch stays TRAIN.batch_size.
    host_accum = bool(cfg.TRAIN.get("host_accum", False)) and batch_size > n_dev
    if host_accum:
        from ..train.trainstep import make_accum_train_step

        astep = make_accum_train_step(loss_fn, optimizer, mesh)
        n_micro = batch_size // n_dev
        logger.info(f"host-accum: {n_micro} microbatches x {n_dev}/step")

        def _split_micro(full):
            return [
                shard_batch(jax.tree_util.tree_map(
                    lambda x, i=i: x[i * n_dev:(i + 1) * n_dev]
                    if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0 else x,
                    full), mesh)
                for i in range(n_micro)
            ]

        def pstep(state, full_batch):
            return astep(state, _split_micro(full_batch))
    else:
        pstep = make_parallel_train_step(loss_fn, optimizer, mesh)
    estep = make_parallel_eval_step(_eval_metrics_fn(rt.statics), mesh)
    vis_fwd = jax.jit(
        lambda params, batch: forward_pipeline(params, batch, rt.statics)[0]
    )

    loader = PrefetchLoader(train_ds, batch_size, shuffle=True)
    train_iter = endless(loader)
    meter = MovingAverageMeter()
    speed = SpeedMeter()

    total = max_iters or int(cfg.TRAIN.train_iter)
    check_interval = int(cfg.TRAIN.check_interval)
    visual_interval = int(cfg.TRAIN.get("visual_interval", 1000))

    state = replicate(state, mesh)
    profile_start = init_iter + 2  # skip compile iterations
    for it in range(init_iter, total + 1):
        if profile_dir and it == profile_start:
            jax.profiler.start_trace(profile_dir)
        raw = next(train_iter)
        # host-accum shards per microbatch inside pstep; visuals/sharding
        # below use a batch the compile service accepts (first microbatch)
        if host_accum:
            batch = shard_batch(jax.tree_util.tree_map(
                lambda x: x[:n_dev]
                if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0 else x,
                raw), mesh)
            step_in = raw
        else:
            batch = shard_batch(raw, mesh)
            step_in = batch
        with speed.time_frame():
            state, loss, metrics = pstep(state, step_in)
        meter.update({k: float(v) for k, v in metrics.items()})
        if profile_dir and it == profile_start + 2:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            logger.info(f"profiler trace (3 iters) written to {profile_dir}")
        if it % 100 == 0 or debug:
            logger.info(f"iter {it}: {meter.format()} ({speed.render_fps:.2f} it/s)")

        if it % visual_interval == 0:
            _dump_visuals(vis_fwd, state, batch, vis_dir, it)
        if it % check_interval == 0 or it == total:
            val = run_validation(
                estep, state, valid_ds,
                n_dev if host_accum else batch_size, mesh)
            logger.info(f"validation @{it}: psnr={val['psnr']:.3f} ssim={val['ssim']:.4f}")
            ckpts.save_latest(state, it)
            if val["ssim"] > ckpts.best_ssim():
                ckpts.save_best(state, it, val["ssim"])
        if it == 100000:
            ckpts.save_named("100000", state, it)
    return state


def _eval_metrics_fn(statics):
    """Per-shard validation metrics; pmean'd over the mesh by the eval step."""

    def fn(params, batch):
        outputs, _, _ = forward_pipeline(params, batch, statics)
        gt = batch["target"]["image"] * batch["target"]["mask"]
        r = jnp.clip(outputs.renders, 0, 1)
        return {"psnr": psnr(r, gt).mean(), "ssim": ssim(r, gt)}

    return fn


def _dump_visuals(vis_fwd, state, batch, vis_dir: str, it: int) -> None:
    """Render a GT / refined / raw grid with the jitted forward (the batch
    is already on the mesh; take the first two items host-side after)."""
    try:
        outputs = vis_fwd(state.params, batch)
        gt = np.asarray(batch["target"]["image"]) * np.asarray(batch["target"]["mask"])
        n = min(2, gt.shape[0])
        _save_grid(
            os.path.join(vis_dir, f"training_{it}.jpg"),
            [gt[:n], np.asarray(outputs.renders)[:n], np.asarray(outputs.raw_renders)[:n]],
        )
    except Exception as e:  # visuals must never kill training
        print(f"[visuals] skipped: {e}")


def run_validation(estep, state, valid_ds, batch_size: int, mesh) -> dict:
    """Mean PSNR/SSIM over the validation split, computed on-device and
    pmean'd across the mesh per batch (ref: trainer.py:139-189 — DDP ranks
    each eval a shard then fabric.all_reduce the scalars)."""
    loader = PrefetchLoader(valid_ds, batch_size, shuffle=False, drop_last=True)
    psnrs, ssims = [], []
    for batch in loader:
        m = estep(state.params, shard_batch(batch, mesh))
        psnrs.append(float(m["psnr"]))
        ssims.append(float(m["ssim"]))
    if not psnrs:
        return {"psnr": 0.0, "ssim": 0.0}
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
