"""Inference surfaces: self/cross reenactment, novel views, avatar export.

Parity with main/test.py (ref: main/test.py:21-278): warm-up + timed
one-shot inference, avatar build (+prune), PLY export, per-frame
deform+render over the test frames, gt/ + render/ PNG dumps, side-by-side
MP4 at 30 fps, and speed_info.json with {infer_time ms, render_speed fps}.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..avatar.deformer import deform_avatar
from ..avatar.inferer import build_avatar
from ..avatar.state import prune_avatar
from ..train.pipeline import _unpack_params
from ..utils.camera_orbit import generate_novel_view_poses
from ..utils.logging_utils import SpeedMeter
from ..utils.ply import save_gaussian_ply
from .context import Runtime, camera_from_w2c


def _save_png(path: str, img: np.ndarray) -> None:
    import cv2

    img = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def _write_video(path: str, frames: list[np.ndarray], fps: int = 30) -> None:
    import cv2

    if not frames:
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        f8 = np.clip(np.asarray(f) * 255.0, 0, 255).astype(np.uint8)
        vw.write(cv2.cvtColor(f8, cv2.COLOR_RGB2BGR))
    vw.release()


def _batched(rec_params: dict) -> dict:
    return {k: jnp.asarray(v)[None] for k, v in rec_params.items()}


def infer_avatar(rt: Runtime, params: dict, source: dict, prune: bool = True):
    """One-shot avatar from a source record (ref: test.py:38-56)."""
    body, flame = _unpack_params(
        {k: jnp.asarray(v) for k, v in source["params"].items()}
    )
    avatar, extra = build_avatar(
        rt.inferer,
        {"params": params["inferer"]},
        rt.ehm,
        rt.statics.faces,
        rt.statics.uvmap_f_idx,
        rt.statics.uvmap_f_bary,
        rt.statics.uvmap_mask,
        jnp.asarray(source["image"])[None],
        jnp.asarray(source["w2c"])[None],
        body,
        flame,
        image_size=rt.cfg.MODEL.image_size,
        invtanfov=float(rt.cfg.MODEL.invtanfov),
    )
    if prune:
        avatar = prune_avatar(
            avatar, float(rt.cfg.MODEL.get("opacity_threshold", 0.001))
        )
    return avatar, extra


def render_frame(rt: Runtime, params: dict, avatar, target: dict) -> dict:
    """Deform + rasterize + refine one target record (ref: test.py:70-80)."""
    body, flame = _unpack_params(_batched(target["params"]))
    gs = deform_avatar(avatar, rt.ehm, rt.statics.faces, body, flame)
    cam = camera_from_w2c(rt, np.asarray(target["w2c"]))
    outputs = rt.renderer.apply(
        {"params": params["renderer"]}, gs, [cam]
    )
    return {
        "render": np.asarray(jnp.clip(outputs.renders[0], 0, 1)),
        "raw": np.asarray(jnp.clip(outputs.raw_renders[0], 0, 1)),
    }


def render_set(
    rt: Runtime,
    params: dict,
    dataset,
    save_path: str,
    saving_name: str = "render",
    max_frames: int | None = None,
    export_ply: bool = True,
) -> dict:
    """Self-reenactment over the test frames of each video (ref: test.py:30-94)."""
    os.makedirs(save_path, exist_ok=True)
    speed = SpeedMeter()

    by_video: dict[str, list[int]] = {}
    for i, key in enumerate(dataset.frames):
        vid = key.split("/")[0]
        by_video.setdefault(vid, []).append(i)

    results = {}
    for vid, idxs in by_video.items():
        scene_dir = os.path.join(save_path, vid)
        rdir = os.path.join(scene_dir, saving_name)
        gdir = os.path.join(scene_dir, "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)

        first = dataset[idxs[0]]
        # warm-up then timed inference (ref: test.py:41-50)
        infer_avatar(rt, params, first["source"])
        with speed.time_infer():
            avatar, _ = infer_avatar(rt, params, first["source"])
            jax.block_until_ready(avatar.uv_colors)

        if export_ply:
            from ..avatar.deformer import canonical_gaussians

            gs = canonical_gaussians(avatar, rt.statics.faces)
            save_gaussian_ply(
                os.path.join(scene_dir, "avatar.ply"),
                np.asarray(gs.xyz[0]),
                np.asarray(gs.colors[0, :, :3]),
                np.asarray(gs.opacity[0]),
                np.asarray(gs.scaling[0]),
                np.asarray(gs.rotation[0]),
            )

        frames = []
        sel = idxs if max_frames is None else idxs[:max_frames]
        for i in sel:
            rec = dataset[i]
            with speed.time_frame():
                out = render_frame(rt, params, avatar, rec["target"])
                jax.block_until_ready(out["render"])
            name = f"{i:06d}.png"
            gt = np.asarray(rec["target"]["image"]) * np.asarray(rec["target"]["mask"])
            _save_png(os.path.join(gdir, name), gt)
            _save_png(os.path.join(rdir, name), out["render"])
            frames.append(np.concatenate([gt, out["render"]], axis=1))
        _write_video(os.path.join(scene_dir, f"{vid}_compare.mp4"), frames)
        speed.dump(os.path.join(scene_dir, "speed_info.json"))
        results[vid] = {
            "frames": len(sel),
            "infer_time_ms": speed.infer_time_ms,
            "render_fps": speed.render_fps,
        }
    return results


def change_id_info(target_params: dict, source_params: dict) -> dict:
    """Swap identity fields from the source into the target motion
    (ref: main/test.py:21-28)."""
    out = dict(target_params)
    for k in ("shape", "joints_offset", "head_scale", "hand_scale", "flame_shape"):
        if k in source_params:
            out[k] = source_params[k]
    return out


def render_cross_set(
    rt: Runtime,
    params: dict,
    source_dataset,
    target_dataset,
    save_path: str,
    keep_source_cam: bool = False,
    max_frames: int | None = None,
) -> None:
    """Cross-reenactment (ref: main/test.py:96-139)."""
    os.makedirs(save_path, exist_ok=True)
    src = source_dataset[0]
    avatar, _ = infer_avatar(rt, params, src["source"])
    frames = []
    n = len(target_dataset) if max_frames is None else min(max_frames, len(target_dataset))
    for i in range(n):
        rec = target_dataset[i]
        tgt = dict(rec["target"])
        tgt["params"] = change_id_info(tgt["params"], src["source"]["params"])
        if keep_source_cam:
            tgt["w2c"] = src["source"]["w2c"]
        out = render_frame(rt, params, avatar, tgt)
        _save_png(os.path.join(save_path, f"{i:06d}.png"), out["render"])
        frames.append(out["render"])
    _write_video(os.path.join(save_path, "cross_reenact.mp4"), frames)


def render_novel_views(
    rt: Runtime,
    params: dict,
    dataset,
    save_path: str,
    static: bool = False,
    frame_idx: int = 0,
    num_keyframes: int = 120,
) -> None:
    """Orbit renders, static pose or animated (ref: main/test.py:141-216)."""
    os.makedirs(save_path, exist_ok=True)
    first = dataset[frame_idx]
    avatar, _ = infer_avatar(rt, params, first["source"])
    c2w = np.linalg.inv(np.asarray(first["target"]["w2c"]))
    poses = generate_novel_view_poses(c2w, num_keyframes=num_keyframes)
    frames = []
    for i, w2c in enumerate(poses):
        rec = first if static else dataset[min(i, len(dataset) - 1)]
        tgt = dict(rec["target"])
        tgt["w2c"] = w2c
        out = render_frame(rt, params, avatar, tgt)
        _save_png(os.path.join(save_path, f"{i:06d}.png"), out["render"])
        frames.append(out["render"])
    _write_video(os.path.join(save_path, "novel_views.mp4"), frames)
