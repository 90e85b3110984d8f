"""Full training pipeline assembly: inferer -> avatar -> deform -> render -> loss.

This is the functional equivalent of the reference's per-iteration block
(ref: main/trainer.py:72-102): source batch in, avatar predicted, target
pose deformed, rasterized + refined, Optimization_Loss out. Packaged as a
pure `loss_fn(params, batch, iteration)` so the same function drives
single-chip training, the shard_map DP step, and the dry-run harness.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..avatar.deformer import deform_avatar
from ..avatar.inferer import InfererConfig, UbodyGaussianInferer, build_avatar
from ..avatar.renderer import GaussianRenderer
from ..bodymodel.ehm import BodyParams, EhmModel, FlameParams
from ..core.cameras import Camera
from ..ops.gsplat import RasterizeSettings
from .losses import LossConfig, OptimizationLoss
from .lpips import LPIPS


class PipelineStatics(NamedTuple):
    """Non-trainable context threaded through the loss function."""

    ehm: EhmModel
    faces: jnp.ndarray
    uvmap_f_idx: jnp.ndarray
    uvmap_f_bary: jnp.ndarray
    uvmap_mask: jnp.ndarray
    inferer: UbodyGaussianInferer
    renderer: GaussianRenderer
    lpips: LPIPS
    loss_cfg: LossConfig
    image_size: int
    invtanfov: float


def make_models(
    cfg: InfererConfig,
    num_vertices: int,
    refiner_type: str = "styleunet",
    refiner_channel_scale: float = 1.0,
    raster_settings: RasterizeSettings = RasterizeSettings(),
):
    inferer = UbodyGaussianInferer(cfg=cfg, num_vertices=num_vertices)
    renderer = GaussianRenderer(
        refiner_type=refiner_type,
        image_size=cfg.image_size,
        channel_scale=refiner_channel_scale,
        small=True,
        # the reference uses one style config for both StyleUNets
        style_dim=cfg.style_dim,
        num_mlp=cfg.num_mlp,
        settings=raster_settings,
    )
    return inferer, renderer


def _unpack_params(p: dict) -> tuple[BodyParams, FlameParams]:
    body = BodyParams(
        shape=p["shape"],
        body_pose=p["body_pose"],
        global_pose=p.get("global_pose"),
        left_hand_pose=p.get("left_hand_pose"),
        right_hand_pose=p.get("right_hand_pose"),
        exp=p.get("exp"),
        joints_offset=p.get("joints_offset"),
        head_scale=p.get("head_scale"),
        hand_scale=p.get("hand_scale"),
    )
    flame = FlameParams(
        shape=p["flame_shape"],
        exp=p["flame_exp"],
        jaw=p["flame_jaw"],
        eyes=p.get("flame_eyes"),
        eyelids=p.get("flame_eyelids"),
    )
    return body, flame


def forward_pipeline(params: dict, batch: dict, statics: PipelineStatics, rngs=None):
    """Runs the whole forward path. Returns (render_outputs, avatar, extra)."""
    src = batch["source"]
    tgt = batch["target"]
    body_s, flame_s = _unpack_params(src["params"])
    avatar, extra = build_avatar(
        statics.inferer,
        {"params": params["inferer"]},
        statics.ehm,
        statics.faces,
        statics.uvmap_f_idx,
        statics.uvmap_f_bary,
        statics.uvmap_mask,
        src["image"],
        src["w2c"],
        body_s,
        flame_s,
        image_size=statics.image_size,
        invtanfov=statics.invtanfov,
        rngs=rngs,
    )
    body_t, flame_t = _unpack_params(tgt["params"])
    gaussians = deform_avatar(avatar, statics.ehm, statics.faces, body_t, flame_t)

    B = gaussians.xyz.shape[0]
    tanfov = 1.0 / statics.invtanfov
    cams = [
        Camera(
            R=tgt["w2c"][b, :3, :3],
            t=tgt["w2c"][b, :3, 3],
            tanfovx=jnp.asarray(tanfov, jnp.float32),
            tanfovy=jnp.asarray(tanfov, jnp.float32),
            width=statics.image_size,
            height=statics.image_size,
        )
        for b in range(B)
    ]
    outputs = statics.renderer.apply(
        {"params": params["renderer"]}, gaussians, cams, rngs=rngs
    )
    return outputs, avatar, extra


def make_loss_fn(statics: PipelineStatics, lpips_params: Any,
                 remat: bool = False):
    """Builds loss_fn(params, batch, iteration) -> (loss, metrics).

    lpips_params=None swaps the LPIPS term for a cheap multi-scale L2
    stand-in with the same call signature — used by the multi-chip dry run
    where compiling AlexNet per device would dominate the wall clock.
    """
    if lpips_params is None:

        def perceptual(a, b):
            def down4(x):
                shape = (x.shape[0], x.shape[1] // 4, x.shape[2] // 4, x.shape[3])
                return jax.image.resize(x, shape, "linear")

            return jnp.mean((a - b) ** 2) + jnp.mean((down4(a) - down4(b)) ** 2)

    else:

        def perceptual(a, b):
            return statics.lpips.apply({"params": lpips_params}, a, b)

    opt_loss = OptimizationLoss(statics.loss_cfg, perceptual)

    fwd = lambda params, batch: forward_pipeline(params, batch, statics)  # noqa: E731
    if remat:
        # rematerialize the forward in the backward pass instead of saving
        # every conv/blend activation: at 512^2 the un-remat'd step holds
        # ~9.4 GiB of temporaries on a 16 GiB chip, capping local batch at
        # 1. The rasterizer's custom_vjp already replays its own tiles, so
        # the extra compute is one encoder/decoder/refiner forward.
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )

    def loss_fn(params, batch, iteration):
        outputs, avatar, _ = fwd(params, batch)
        tgt = batch["target"]
        total, metrics = opt_loss(
            outputs.renders,
            outputs.raw_renders,
            tgt["image"],
            tgt["mask"],
            tgt.get("boxes"),
            avatar.uv_local_xyz,
            avatar.uv_scales,
            iteration,
        )
        metrics = dict(metrics, total=total)
        return total, metrics

    return loss_fn
