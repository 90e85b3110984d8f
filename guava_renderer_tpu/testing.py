"""Shared test/bench/dry-run fixtures: a tiny synthetic pipeline instance."""

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
    lpips_params: dict
    batch: dict
    num_vertices: int


def make_tiny_pipeline(
    batch_size: int = 2,
    image_size: int = 64,
    feat_size: int = 70,
    uv_size: int = 32,
    seed: int = 0,
) -> TinyPipeline:
    """Small but complete pipeline on synthetic assets (CPU-friendly)."""
    smplx, flame_m, extras = synthetic_ehm(uv_size=uv_size)
    ehm = EhmModel.build(smplx, flame_m, extras)
    invtanfov = 3.0
    cfg = InfererConfig(
        image_size=image_size,
        uvmap_size=uv_size,
        invtanfov=invtanfov,
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
    inferer, renderer = make_models(
        cfg,
        smplx.num_vertices,
        refiner_channel_scale=8.0,
        raster_settings=RasterizeSettings(chunk=8, max_tiles_per_gaussian=8),
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
        loss_cfg=LossConfig(crop_size=32),
        image_size=image_size,
        invtanfov=invtanfov,
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

    batch = {
        "source": {
            "image": jnp.asarray(rng.uniform(0, 1, (B, feat_size, feat_size, 3)), jnp.float32),
            "w2c": jnp.asarray(w2c),
            "params": cam_params(),
        },
        "target": {
            "image": jnp.asarray(rng.uniform(0, 1, (B, image_size, image_size, 3)), jnp.float32),
            "mask": jnp.ones((B, image_size, image_size, 1), jnp.float32),
            "w2c": jnp.asarray(w2c),
            "params": cam_params(),
            "boxes": {
                "head_box": jnp.asarray([[8, 56, 0, 32]] * B, jnp.int32),
                "left_hand_box": jnp.asarray([[0, 24, 32, 64]] * B, jnp.int32),
                "right_hand_box": jnp.asarray([[40, 64, 32, 64]] * B, jnp.int32),
            },
        },
    }

    key = jax.random.PRNGKey(seed)
    dummy = batch["source"]
    inf_params = inferer.init(
        key,
        dummy["image"],
        dummy["w2c"],
        jnp.zeros((B, smplx.num_vertices, 3)),
        jnp.zeros((B, uv_size, uv_size)),
        statics.uvmap_f_idx,
        statics.uvmap_f_bary,
        statics.faces,
    )["params"]
    return _finish_init(
        statics, inf_params, lpips, batch, smplx.num_vertices, key, image_size
    )


def _finish_init(statics, inf_params, lpips, batch, num_vertices, key, image_size):
    from .avatar.state import GaussianSet
    from .core.cameras import Camera

    B = batch["source"]["image"].shape[0]
    P = 16
    gs = GaussianSet(
        xyz=jnp.zeros((B, P, 3)),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, P, 1)),
        scaling=jnp.full((B, P, 3), 0.01),
        opacity=jnp.full((B, P, 1), 0.5),
        colors=jnp.zeros((B, P, 32)),
    )
    tanfov = 1.0 / statics.invtanfov
    cams = [
        Camera(
            R=jnp.eye(3), t=jnp.asarray([0.0, 0, 6.0]),
            tanfovx=jnp.asarray(tanfov), tanfovy=jnp.asarray(tanfov),
            width=image_size, height=image_size,
        )
        for _ in range(B)
    ]
    rend_params = statics.renderer.init(key, gs, cams)["params"]
    x0 = batch["target"]["image"]
    lpips_params = lpips.init(key, x0, x0)["params"]
    params = {"inferer": inf_params, "renderer": rend_params}
    return TinyPipeline(
        statics=statics,
        params=params,
        lpips_params=lpips_params,
        batch=batch,
        num_vertices=num_vertices,
    )
