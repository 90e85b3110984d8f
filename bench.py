"""Benchmark: 512x512 self-reenactment animation loop on one TPU chip.

Measures the per-frame hot path of the reference's render_set timing
(ref: main/test.py:61-94 — per-frame EHM deform + 32-channel rasterize +
StyleUNet refine at 512^2, batch 1), on synthetic full-scale assets
(SMPL-X-scale vertex count, 512^2 UV chart) with random weights — FLOPs and
memory traffic match the real model; weight values don't affect speed.

Rasterizer settings are the PARITY config (tile 16 / chunk 32 /
max_tiles_per_gaussian 8 — the same `MODEL.raster` block the training
config uses, configs/train/ubody_512.yaml), so the number describes the
renderer the rest of the framework runs, not a special-cased fast path.

Robustness: the axon backend is probed in a SUBPROCESS with a hard timeout
and bounded retries before the in-process run (a downed tunnel hangs init
forever), and exactly one JSON line is always printed:
{"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 60.0


def emit(metric: str, value: float, unit: str = "fps"):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": unit,
                "vs_baseline": round(value / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )


def run_bench(platform: str, frames: int, size: int, uv: int, tile: int,
              chunk: int, tpg: int, repeats: int,
              body_side: int = 101, bf16: bool = False) -> tuple[float, int]:
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.avatar.deformer import deform_with_vertices
    from guava_renderer_tpu.avatar.renderer import NeuralRefiner
    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.bodymodel import synthetic_ehm
    from guava_renderer_tpu.bodymodel.ehm import (
        BodyParams,
        EhmModel,
        FlameParams,
        ehm_forward,
    )
    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize

    INVTANFOV = 24.0

    # full-scale synthetic rig: ~10.5k vertices + uv^2 UV chart
    smplx, flame_m, extras = synthetic_ehm(
        body_side=body_side, head_side=15, uv_size=uv, n_shape=50, n_exp=20
    )
    ehm = EhmModel.build(smplx, flame_m, extras)
    faces = jnp.asarray(smplx.faces)
    V = smplx.num_vertices
    N_uv = uv * uv
    rng = np.random.default_rng(0)

    uv_valid = jnp.asarray(extras.uvmap_mask.reshape(-1))
    n_valid = int(np.asarray(uv_valid).sum())

    def mk(shape, lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    quats = rng.normal(size=(1, V, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    uv_quats = rng.normal(size=(1, N_uv, 4)).astype(np.float32)
    uv_quats /= np.linalg.norm(uv_quats, axis=-1, keepdims=True)

    avatar = GaussianAvatar(
        vtx_positions=jnp.asarray(smplx.v_template)[None],
        vtx_colors=mk((1, V, 32), 0, 1),
        vtx_opacity=mk((1, V, 1), 0.3, 0.95),
        vtx_scales=mk((1, V, 3), 0.002, 0.01),
        vtx_rotations=jnp.asarray(quats),
        uv_local_xyz=mk((1, N_uv, 3), -0.5, 0.5),
        uv_colors=mk((1, N_uv, 32), 0, 1),
        uv_opacity=mk((1, N_uv, 1), 0.3, 0.95),
        uv_scales=mk((1, N_uv, 3), 0.05, 0.3),
        uv_rotations=jnp.asarray(uv_quats),
        uv_binding_face=jnp.asarray(extras.uvmap_f_idx.reshape(-1)),
        uv_face_bary=jnp.asarray(extras.uvmap_f_bary.reshape(-1, 3)),
        uv_valid=uv_valid,
    )

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 30.0  # long lens (invtanfov 24) needs distance
    cam = Camera(
        R=jnp.asarray(w2c[:3, :3]),
        t=jnp.asarray(w2c[:3, 3]),
        tanfovx=jnp.asarray(1.0 / INVTANFOV),
        tanfovy=jnp.asarray(1.0 / INVTANFOV),
        width=size,
        height=size,
    )
    bg = jnp.zeros(32)
    settings = RasterizeSettings(tile=tile, chunk=chunk, max_tiles_per_gaussian=tpg)

    refiner = NeuralRefiner(image_size=size, small=True)
    feat0 = jnp.zeros((1, size, size, 32))
    ref_params = refiner.init(jax.random.PRNGKey(0), feat0)
    if bf16:
        # bf16 refiner: params + activations ride the MXU at half the HBM
        # traffic; rasterizer stays f32 (blending precision contract)
        ref_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            ref_params,
        )

    base_body = BodyParams(
        shape=jnp.zeros((1, smplx.n_shape)),
        body_pose=jnp.zeros((1, 21, 3)),
    )
    base_flame = FlameParams(
        shape=jnp.zeros((1, smplx.n_shape)),
        exp=jnp.zeros((1, smplx.n_exp)),
        jaw=jnp.zeros((1, 3)),
    )

    def frame(pose_scale):
        body = base_body._replace(body_pose=base_body.body_pose + pose_scale * 0.01)
        res = ehm_forward(ehm, body, base_flame)
        gs = deform_with_vertices(avatar, res.vertices, res.vertex_transforms, faces)
        color, _, _ = rasterize(
            gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0], gs.rotation[0],
            cam, bg, settings,
        )
        feats = jnp.transpose(color, (1, 2, 0))[None]
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        rgb = refiner.apply(ref_params, feats)
        return jnp.sum(rgb.astype(jnp.float32))

    # Time by looping inside jit with a data dependency and fetching a
    # scalar — block_until_ready does not sync reliably through the tunnel.
    @jax.jit
    def run(_):
        def body(i, acc):
            return acc + frame(acc * 1e-12 + i)
        return jax.lax.fori_loop(0, frames, body, 0.0)

    r = float(run(0))  # compile + warm up
    best = 0.0
    for rep in range(1, repeats + 1):
        t0 = time.time()
        r = float(run(rep))
        dt = (time.time() - t0) / frames
        best = max(best, 1.0 / dt)
    return best, V + n_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon", choices=["axon", "cpu", "tpu"])
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--uv", type=int, default=512)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--tpg", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--body-side", type=int, default=101)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 refiner params+activations (rasterizer stays f32)")
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--probe-attempts", type=int, default=2)
    ap.add_argument("--probe-timeout", type=float, default=150.0)
    args = ap.parse_args()
    platform = "axon" if args.platform == "tpu" else args.platform

    from guava_renderer_tpu.utils.platform import probe_backend_retry

    if platform == "axon" and not args.skip_probe:
        ok, detail = probe_backend_retry(
            platform, attempts=args.probe_attempts,
            timeout_s=args.probe_timeout, backoff_s=20.0,
        )
        if not ok:
            emit(
                f"self-reenactment render FPS @{args.size}px "
                f"(backend unavailable: {detail})",
                0.0,
            )
            return

    fps, P = run_bench(
        platform, args.frames, args.size, args.uv,
        args.tile, args.chunk, args.tpg, args.repeats,
        body_side=args.body_side, bf16=args.bf16,
    )
    emit(
        f"self-reenactment render FPS @{args.size}px, P={P} gaussians, "
        f"tile={args.tile} chunk={args.chunk} tpg={args.tpg} (parity config"
        f"{', bf16 refiner' if args.bf16 else ''}), {platform} chip",
        fps,
    )


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        traceback.print_exc()
        emit("self-reenactment render FPS @512px (run failed)", 0.0)
