"""Shared test/bench/dry-run fixtures: tiny synthetic pipeline instances.

`make_tiny_pipeline` is the CPU-test-suite fixture (full-size ViT graph on
small shapes). `make_micro_pipeline` is deliberately even smaller — it is
what `__graft_entry__.dryrun_multichip` compiles, and it must trace +
compile + execute a full fwd/bwd/optimizer step for 8 virtual devices in
well under 3 minutes on ONE CPU core (driver gate). Every architectural
boundary is still crossed: ViT+DPT encoder, both decoders, inverse texture
mapping, mesh-visibility rasterizer, Pallas Gaussian rasterizer (interpret
mode off-TPU), StyleUNet refiner, crop losses, optimizer, shard_map psum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .avatar.inferer import InfererConfig
from .bodymodel import synthetic_ehm
from .bodymodel.ehm import EhmModel
from .ops.gsplat import RasterizeSettings
from .train.losses import LossConfig
from .train.lpips import LPIPS
from .train.pipeline import PipelineStatics, make_models


class TinyPipeline(NamedTuple):
    statics: PipelineStatics
    params: dict
    lpips_params: dict | None
    batch: dict
    num_vertices: int


def make_tiny_pipeline(
    batch_size: int = 2,
    image_size: int = 64,
    feat_size: int = 70,
    uv_size: int = 32,
    seed: int = 0,
    with_lpips: bool = True,
) -> TinyPipeline:
    """Small but complete pipeline on synthetic assets (CPU-friendly)."""
    cfg = InfererConfig(
        image_size=image_size,
        uvmap_size=uv_size,
        invtanfov=3.0,
        dino_out_dim=8,
        uv_out_dim=16,
        smplx_fea_dim=16,
        prj_out_dim=16,
        global_vertex_dim=32,
        uv_base_dim=8,
        style_dim=64,
        num_mlp=2,
        channel_scale=8.0,
    )
    return _build_pipeline(
        cfg,
        batch_size=batch_size,
        feat_size=feat_size,
        seed=seed,
        with_lpips=with_lpips,
        raster_settings=RasterizeSettings(chunk=8, max_tiles_per_gaussian=8),
        crop_size=32,
        synth_kwargs={},
    )


def make_micro_pipeline(batch_size: int = 8, seed: int = 0) -> TinyPipeline:
    """Smallest config that still crosses every pipeline boundary.

    Used by the driver's multi-chip dry run: 32^2 render, 28^2 source image
    (2x2 ViT tokens), 16^2 UV chart, 5-block 64-dim ViT, LPIPS swapped for
    the multi-scale L2 stand-in (lpips_params=None)."""
    cfg = InfererConfig(
        image_size=32,
        uvmap_size=16,
        invtanfov=3.0,
        dino_out_dim=4,
        uv_out_dim=8,
        smplx_fea_dim=8,
        prj_out_dim=8,
        global_vertex_dim=16,
        uv_base_dim=4,
        style_dim=32,
        num_mlp=2,
        channel_scale=16.0,
        vit_dim=64,
        vit_depth=5,
        vit_heads=4,
        pyramid_dims=(16, 16, 16, 16),
    )
    return _build_pipeline(
        cfg,
        batch_size=batch_size,
        feat_size=28,
        seed=seed,
        with_lpips=False,
        raster_settings=RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=4),
        crop_size=16,
        synth_kwargs=dict(body_side=12, head_side=6, n_shape=8, n_exp=4),
    )


def _build_pipeline(
    cfg: InfererConfig,
    batch_size: int,
    feat_size: int,
    seed: int,
    with_lpips: bool,
    raster_settings: RasterizeSettings,
    crop_size: int,
    synth_kwargs: dict,
) -> TinyPipeline:
    smplx, flame_m, extras = synthetic_ehm(uv_size=cfg.uvmap_size, **synth_kwargs)
    ehm = EhmModel.build(smplx, flame_m, extras)
    image_size = cfg.image_size
    uv_size = cfg.uvmap_size
    inferer, renderer = make_models(
        cfg,
        smplx.num_vertices,
        refiner_channel_scale=cfg.channel_scale,
        raster_settings=raster_settings,
    )
    lpips = LPIPS(net_type="alex")
    statics = PipelineStatics(
        ehm=ehm,
        faces=jnp.asarray(smplx.faces),
        uvmap_f_idx=jnp.asarray(extras.uvmap_f_idx),
        uvmap_f_bary=jnp.asarray(extras.uvmap_f_bary),
        uvmap_mask=jnp.asarray(extras.uvmap_mask),
        inferer=inferer,
        renderer=renderer,
        lpips=lpips,
        loss_cfg=LossConfig(crop_size=crop_size),
        image_size=image_size,
        invtanfov=cfg.invtanfov,
    )

    rng = np.random.default_rng(seed)
    B = batch_size
    w2c = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    w2c[:, 2, 3] = 6.0

    def cam_params():
        return {
            "shape": jnp.asarray(rng.normal(size=(B, smplx.n_shape)) * 0.1, jnp.float32),
            "body_pose": jnp.asarray(rng.normal(size=(B, 21, 3)) * 0.05, jnp.float32),
            "flame_shape": jnp.zeros((B, smplx.n_shape), jnp.float32),
            "flame_exp": jnp.asarray(rng.normal(size=(B, smplx.n_exp)) * 0.1, jnp.float32),
            "flame_jaw": jnp.zeros((B, 3), jnp.float32),
        }

    s = image_size
    batch = {
        "source": {
            "image": jnp.asarray(rng.uniform(0, 1, (B, feat_size, feat_size, 3)), jnp.float32),
            "w2c": jnp.asarray(w2c),
            "params": cam_params(),
        },
        "target": {
            "image": jnp.asarray(rng.uniform(0, 1, (B, s, s, 3)), jnp.float32),
            "mask": jnp.ones((B, s, s, 1), jnp.float32),
            "w2c": jnp.asarray(w2c),
            "params": cam_params(),
            "boxes": {
                "head_box": jnp.asarray([[s // 8, s * 7 // 8, 0, s // 2]] * B, jnp.int32),
                "left_hand_box": jnp.asarray([[0, s * 3 // 8, s // 2, s]] * B, jnp.int32),
                "right_hand_box": jnp.asarray([[s * 5 // 8, s, s // 2, s]] * B, jnp.int32),
            },
        },
    }

    # Initialize all networks at batch 1 — parameter shapes are batch-free
    # and a B=1 init pass costs 1/B of the eager forward.
    key = jax.random.PRNGKey(seed)
    src1 = jax.tree_util.tree_map(lambda x: x[:1], batch["source"])
    inf_params = inferer.init(
        key,
        src1["image"],
        src1["w2c"],
        jnp.zeros((1, smplx.num_vertices, 3)),
        jnp.zeros((1, uv_size, uv_size)),
        statics.uvmap_f_idx,
        statics.uvmap_f_bary,
        statics.faces,
    )["params"]

    from .avatar.state import GaussianSet
    from .core.cameras import Camera

    P = 16
    gs = GaussianSet(
        xyz=jnp.zeros((1, P, 3)),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, P, 1)),
        scaling=jnp.full((1, P, 3), 0.01),
        opacity=jnp.full((1, P, 1), 0.5),
        colors=jnp.zeros((1, P, 32)),
    )
    tanfov = 1.0 / statics.invtanfov
    cams = [
        Camera(
            R=jnp.eye(3), t=jnp.asarray([0.0, 0, 6.0]),
            tanfovx=jnp.asarray(tanfov), tanfovy=jnp.asarray(tanfov),
            width=image_size, height=image_size,
        )
    ]
    rend_params = renderer.init(key, gs, cams)["params"]
    if with_lpips:
        x0 = batch["target"]["image"][:1]
        lpips_params = lpips.init(key, x0, x0)["params"]
    else:
        lpips_params = None
    params = {"inferer": inf_params, "renderer": rend_params}
    return TinyPipeline(
        statics=statics,
        params=params,
        lpips_params=lpips_params,
        batch=batch,
        num_vertices=smplx.num_vertices,
    )
