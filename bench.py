"""Benchmark: 512x512 self-reenactment animation loop on one TPU chip.

Measures the per-frame hot path of the reference's render_set timing
(ref: main/test.py:61-94 — per-frame EHM deform + 32-channel rasterize +
StyleUNet refine at 512^2, batch 1), on synthetic full-scale assets
(SMPL-X-scale vertex count, 512^2 UV chart) with random weights — FLOPs and
memory traffic match the real model; weight values don't affect speed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json north star of 60 FPS/chip.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_FPS = 60.0
FRAMES = 20


def main():
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

    SIZE = 512
    INVTANFOV = 24.0

    # full-scale synthetic rig: ~10.5k vertices + 512^2 UV chart
    smplx, flame_m, extras = synthetic_ehm(
        body_side=101, head_side=15, uv_size=512, n_shape=50, n_exp=20
    )
    ehm = EhmModel.build(smplx, flame_m, extras)
    faces = jnp.asarray(smplx.faces)
    V = smplx.num_vertices
    N_uv = 512 * 512
    rng = np.random.default_rng(0)

    uv_valid = jnp.asarray(extras.uvmap_mask.reshape(-1))
    n_valid = int(np.asarray(uv_valid).sum())

    # avatar with plausible attribute statistics
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

    # camera looking at the rig
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 30.0  # long lens (invtanfov 24) needs distance
    cam = Camera(
        R=jnp.asarray(w2c[:3, :3]),
        t=jnp.asarray(w2c[:3, 3]),
        tanfovx=jnp.asarray(1.0 / INVTANFOV),
        tanfovy=jnp.asarray(1.0 / INVTANFOV),
        width=SIZE,
        height=SIZE,
    )
    bg = jnp.zeros(32)
    settings = RasterizeSettings(tile=32, chunk=64, max_tiles_per_gaussian=4)

    refiner = NeuralRefiner(image_size=SIZE, small=True)
    feat0 = jnp.zeros((1, SIZE, SIZE, 32))
    ref_params = refiner.init(jax.random.PRNGKey(0), feat0)

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
        rgb = refiner.apply(ref_params, feats)
        return jnp.sum(rgb)

    @jax.jit
    def run(_):
        def body(i, acc):
            return acc + frame(acc * 1e-12 + i)
        return jax.lax.fori_loop(0, FRAMES, body, 0.0)

    # compile + warm up
    r = float(run(0))
    t0 = time.time()
    r = float(run(1))
    dt = (time.time() - t0) / FRAMES
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"self-reenactment render FPS @512px, P={V + n_valid} gaussians, v5e chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "self-reenactment render FPS @512px (run failed)",
                    "value": 0.0,
                    "unit": "fps",
                    "vs_baseline": 0.0,
                }
            )
        )
