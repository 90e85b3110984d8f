"""Training loss (ref: utils/loss_utils.py:73-159 Optimization_Loss).

Terms: masked-background L1 + LPIPS on refined AND raw renders; head/hand
crop L1+LPIPS on boxes resampled to a fixed crop size; UV-Gaussian
regularizers relu(|local_xyz|-3)*0.01 and relu(scale-0.6)-norm*1.0.

TPU-first difference: the reference crops with dynamic python slicing and
F.interpolate per item (loss_utils.py:140-159); here crops are extracted
with a differentiable fixed-size bilinear resample of the box region
(static shapes, batched, jit-clean).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from ..avatar.sampling import grid_sample


class LossConfig(NamedTuple):
    """(ref: configs/train/ubody_512.yaml OPTIMIZE section)."""

    lambda_l1: float = 1.0
    lambda_perpetual: float = 0.025
    lambda_perpetual_high: float = 0.05
    perpetual_increase_iter: int = 10000
    lambda_head_crop: float = 0.25
    lambda_hand_crop: float = 0.1
    lambda_local_xyz: float = 0.01
    lambda_local_scale: float = 1.0
    threshold_local_xyz: float = 3.0
    threshold_scale: float = 0.6
    mask_renders_until: int = 1000
    crop_size: int = 256
    bg_color: float = 0.0


def crop_resample(images: jnp.ndarray, box: jnp.ndarray, size: int) -> jnp.ndarray:
    """Differentiable box crop + resize. images (B, H, W, C), box (B, 4)
    [left, right, top, bottom] pixels -> (B, size, size, C).

    Matches F.interpolate(crop, size, bilinear, align_corners=False)."""
    B, H, W, _ = images.shape
    l, r, t, b = (box[:, i].astype(jnp.float32) for i in range(4))
    j = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    # absolute source pixel coords (align_corners=False box resampling)
    xs = l[:, None] + j[None, :] * (r - l)[:, None] - 0.5   # (B, size)
    ys = t[:, None] + j[None, :] * (b - t)[:, None] - 0.5
    # to NDC of the full image (grid_sample convention)
    nx = (2.0 * xs + 1.0) / W - 1.0
    ny = (2.0 * ys + 1.0) / H - 1.0
    grid = jnp.stack(
        [jnp.broadcast_to(nx[:, None, :], (B, size, size)),
         jnp.broadcast_to(ny[:, :, None], (B, size, size))],
        axis=-1,
    )
    return grid_sample(images, grid, padding="border")


class OptimizationLoss:
    """Functional loss; perceptual_fn is any callable (x, y) -> scalar
    (the LPIPS apply closure), injected like init_perpetual_loss (ref :86)."""

    def __init__(self, cfg: LossConfig, perceptual_fn: Callable):
        self.cfg = cfg
        self.perceptual = perceptual_fn

    def __call__(
        self,
        renders: jnp.ndarray,        # (B, H, W, 3) refined
        raw_renders: jnp.ndarray | None,
        gt_images: jnp.ndarray,      # (B, H, W, 3)
        gt_masks: jnp.ndarray,       # (B, H, W, 1)
        boxes: dict[str, jnp.ndarray] | None,  # head/left_hand/right_hand (B, 4)
        uv_local_xyz: jnp.ndarray,   # (B, N, 3)
        uv_scales: jnp.ndarray,      # (B, N, 3)
        iter_idx: jnp.ndarray,       # scalar int
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        cfg = self.cfg
        lam_p = jnp.where(
            iter_idx > cfg.perpetual_increase_iter,
            cfg.lambda_perpetual_high,
            cfg.lambda_perpetual,
        )
        gt = gt_images * gt_masks + (1.0 - gt_masks) * cfg.bg_color
        mask_renders = iter_idx < cfg.mask_renders_until
        renders = jnp.where(
            mask_renders, renders * gt_masks + (1.0 - gt_masks) * cfg.bg_color, renders
        )

        losses = {}
        losses["image_loss"] = jnp.abs(renders - gt).mean() * cfg.lambda_l1
        losses["perpetual_loss"] = self.perceptual(renders, gt) * lam_p

        def box_loss(pred, name):
            crop_gt = crop_resample(gt, boxes[name], cfg.crop_size)
            crop_pred = crop_resample(pred, boxes[name], cfg.crop_size)
            return (
                jnp.abs(crop_pred - crop_gt).mean() * cfg.lambda_l1
                + self.perceptual(crop_pred, crop_gt) * lam_p
            )

        if boxes is not None and cfg.lambda_head_crop > 0:
            losses["head_loss"] = box_loss(renders, "head_box") * cfg.lambda_head_crop
        if boxes is not None and cfg.lambda_hand_crop > 0:
            losses["hand_loss"] = (
                box_loss(renders, "left_hand_box") + box_loss(renders, "right_hand_box")
            ) * cfg.lambda_hand_crop

        if raw_renders is not None:
            raw = jnp.where(
                mask_renders,
                raw_renders * gt_masks + (1.0 - gt_masks) * cfg.bg_color,
                raw_renders,
            )
            losses["image_loss"] += jnp.abs(raw - gt).mean() * cfg.lambda_l1
            losses["perpetual_loss"] += self.perceptual(raw, gt) * lam_p
            if boxes is not None and cfg.lambda_head_crop > 0:
                losses["head_loss"] += box_loss(raw, "head_box") * cfg.lambda_head_crop
            if boxes is not None and cfg.lambda_hand_crop > 0:
                losses["hand_loss"] += (
                    box_loss(raw, "left_hand_box") + box_loss(raw, "right_hand_box")
                ) * cfg.lambda_hand_crop

        losses["local_xyz_loss"] = (
            jnp.maximum(
                jnp.linalg.norm(uv_local_xyz, axis=-1) - cfg.threshold_local_xyz, 0.0
            ).mean()
            * cfg.lambda_local_xyz
        )
        losses["local_scale_loss"] = (
            jnp.linalg.norm(
                jnp.maximum(uv_scales - cfg.threshold_scale, 0.0), axis=-1
            ).mean()
            * cfg.lambda_local_scale
        )
        total = sum(losses.values())
        return total, losses
