"""Inference surfaces: self/cross reenactment, novel views, avatar export.

Parity with main/test.py (ref: main/test.py:21-278): warm-up + timed
one-shot inference, avatar build (+prune), PLY export, per-frame
deform+render over the test frames, gt/ + render/ PNG dumps, side-by-side
MP4 at 30 fps, and speed_info.json with {infer_time ms, render_speed fps}.

Performance: the per-frame path is ONE jitted device call (deform +
rasterize + refine, camera built from the w2c array inside the trace),
reused across frames and videos — the TPU equivalent of the reference's
single device-side render call per frame (ref: main/test.py:61-94).
`prune_avatar` pads the UV set to a shape bucket so different identities
share the same trace.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..avatar.deformer import deform_avatar
from ..avatar.inferer import build_avatar
from ..avatar.renderer import NeuralRefiner
from ..avatar.state import prune_avatar
from ..core.cameras import Camera
from ..models.layers import resize_bilinear
from ..train.pipeline import _unpack_params
from ..utils.camera_orbit import generate_novel_view_poses
from ..utils.logging_utils import SpeedMeter
from ..utils.ply import save_gaussian_ply
from ..utils.pytrees import split_arrays
from .context import Runtime

# identity/pose keys recognized by _unpack_params — everything else in a
# record's params dict is data-layer metadata and must not reach the trace
_PARAM_KEYS = (
    "shape", "body_pose", "global_pose", "left_hand_pose", "right_hand_pose",
    "exp", "joints_offset", "head_scale", "hand_scale",
    "flame_shape", "flame_exp", "flame_jaw", "flame_eyes", "flame_eyelids",
)


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


def _batched_params(rec_params: dict) -> dict:
    """Records are per-frame (unbatched) — always add the batch dim. Keys
    like global_pose are stored (1, 3) where 1 is the JOINT dim, so no
    shape-based 'already batched' heuristics."""
    return {
        k: jnp.asarray(v)[None] for k, v in rec_params.items() if k in _PARAM_KEYS
    }


class FramePipeline:
    """Jitted one-shot inference + per-frame render, built once per model.

    Both closures capture the runtime statics (EHM tables, UV tables,
    modules) as constants; only params / images / pose arrays are traced
    arguments, so frames and videos reuse one compiled executable."""

    def __init__(self, rt: Runtime, params: dict):
        self.rt = rt
        statics = rt.statics
        if statics.renderer.refiner_dtype is not None:
            # match the renderer's refiner compute dtype so the MXU actually
            # runs bf16 (bf16 params x f32 input would promote back to f32)
            dt = statics.renderer.refiner_dtype
            params = dict(params)
            params["renderer"] = jax.tree_util.tree_map(
                lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
                params["renderer"],
            )
        self.params = params
        image_size = int(rt.cfg.MODEL.image_size)
        invtanfov = float(rt.cfg.MODEL.invtanfov)
        ehm = rt.ehm
        faces = statics.faces

        # EHM/UV tables ride as jit ARGUMENTS: embedded as closure
        # constants they serialize to ~GB of MLIR and the tunnel's remote
        # compiler rejects the request with HTTP 413 (utils/pytrees.py)
        ehm_arrays, ehm_rebuild = split_arrays(ehm)
        self._ehm_arrays = ehm_arrays
        self._tables = (faces, statics.uvmap_f_idx, statics.uvmap_f_bary,
                        statics.uvmap_mask)

        def infer_impl(inf_params, ehm_arrs, tables, image, w2c, src_params):
            ehm_ = ehm_rebuild(ehm_arrs)
            faces_, f_idx, f_bary, mask = tables
            body, flame = _unpack_params(src_params)
            avatar, extra = build_avatar(
                statics.inferer,
                {"params": inf_params},
                ehm_,
                faces_,
                f_idx,
                f_bary,
                mask,
                image,
                w2c,
                body,
                flame,
                image_size=image_size,
                invtanfov=invtanfov,
            )
            return avatar, extra

        def frame_impl(rend_params, ehm_arrs, tables, avatar, tgt_params, w2c):
            ehm_ = ehm_rebuild(ehm_arrs)
            faces_ = tables[0]
            body, flame = _unpack_params(tgt_params)
            gs = deform_avatar(avatar, ehm_, faces_, body, flame)
            tanfov = jnp.asarray(1.0 / invtanfov, jnp.float32)
            cam = Camera(
                R=w2c[:3, :3], t=w2c[:3, 3],
                tanfovx=tanfov, tanfovy=tanfov,
                width=image_size, height=image_size,
            )
            outputs = statics.renderer.apply({"params": rend_params}, gs, [cam])
            return (
                jnp.clip(outputs.renders[0], 0, 1),
                jnp.clip(outputs.raw_renders[0], 0, 1),
                outputs.invdepth[0],
            )

        def planned_frame_impl(plan, cfaces, rend_params, ehm_arrs, tables,
                               avatar, tgt_params, w2c):
            ehm_ = ehm_rebuild(ehm_arrs)
            faces_ = tables[0]
            body, flame = _unpack_params(tgt_params)
            gs = deform_avatar(avatar, ehm_, faces_, body, flame,
                               plan=plan, compact_faces=cfaces)
            tanfov = jnp.asarray(1.0 / invtanfov, jnp.float32)
            cam = Camera(
                R=w2c[:3, :3], t=w2c[:3, 3],
                tanfovx=tanfov, tanfovy=tanfov,
                width=image_size, height=image_size,
            )
            outputs = statics.renderer.apply({"params": rend_params}, gs, [cam])
            return (
                jnp.clip(outputs.renders[0], 0, 1),
                jnp.clip(outputs.raw_renders[0], 0, 1),
                outputs.invdepth[0],
            )

        def grouped_frames_impl(plan, cfaces, group, rend_params, ehm_arrs,
                                tables, avatar, tgt_params_g, w2c_g):
            """Grouped two-phase multi-frame render: prep (deform + project
            + bin + pack) xG into stacked HBM buffers, THEN blend + refine
            xG — one device call for G frames. Interleaving prep with the
            Pallas blend costs ~5 ms/frame over the standalone stage sum
            on-chip; phase separation recovers the two-loop additivity
            (outputs/bench/tpu_window_r4c/ee_stages6_newladder.log). Same
            per-frame math as frame_impl, G frames of latency."""
            from ..ops.gsplat import (
                RasterPrep, rasterize_blend, rasterize_prep,
            )

            ehm_ = ehm_rebuild(ehm_arrs)
            faces_ = tables[0]
            renderer = statics.renderer
            st = renderer.settings
            bg = jnp.zeros(32, jnp.float32)
            tanfov = jnp.asarray(1.0 / invtanfov, jnp.float32)

            def prep_one(g):
                tp = jax.tree_util.tree_map(lambda v: v[g], tgt_params_g)
                body, flame = _unpack_params(tp)
                gs = deform_avatar(avatar, ehm_, faces_, body, flame,
                                   plan=plan, compact_faces=cfaces)
                w2c = w2c_g[g]
                cam = Camera(
                    R=w2c[:3, :3], t=w2c[:3, 3],
                    tanfovx=tanfov, tanfovy=tanfov,
                    width=image_size, height=image_size,
                )
                return rasterize_prep(
                    gs.xyz[0], gs.colors[0], gs.opacity[0], gs.scaling[0],
                    gs.rotation[0], cam, st)

            shapes = jax.eval_shape(prep_one, 0)
            tbl = jnp.zeros((group,) + shapes.table.shape, jnp.float32)
            od = jnp.zeros((group,) + shapes.order.shape, jnp.int32)
            rg = jnp.zeros((group,) + shapes.ranges.shape, jnp.int32)

            def prep_g(g, carry):
                tbl_, od_, rg_ = carry
                p = prep_one(g)
                tbl_ = jax.lax.dynamic_update_slice(
                    tbl_, p.table[None], (g, 0, 0))
                od_ = jax.lax.dynamic_update_slice(
                    od_, p.order[None], (g, 0))
                rg_ = jax.lax.dynamic_update_slice(
                    rg_, p.ranges[None], (g, 0))
                return tbl_, od_, rg_

            tbl, od, rg = jax.lax.fori_loop(0, group, prep_g, (tbl, od, rg))

            # refiner tail identical to GaussianRenderer.__call__ (the
            # neural_refiner param subtree is addressed directly)
            rsize = renderer.refiner_size or image_size
            refiner = NeuralRefiner(
                refiner_type=renderer.refiner_type,
                image_size=rsize,
                channel_scale=renderer.channel_scale,
                small=renderer.small,
                style_dim=renderer.style_dim,
                num_mlp=renderer.num_mlp,
            )

            def refine(feats):
                x = feats
                if rsize != image_size:
                    x = resize_bilinear(x, (rsize, rsize))
                if renderer.refiner_dtype is not None:
                    x = x.astype(renderer.refiner_dtype)
                r = refiner.apply(
                    {"params": rend_params["neural_refiner"]}, x)
                r = r.astype(jnp.float32)
                if rsize != image_size:
                    r = resize_bilinear(r, (image_size, image_size))
                return r

            rends = jnp.zeros((group, image_size, image_size, 3))
            raws = jnp.zeros((group, image_size, image_size, 3))
            invds = jnp.zeros((group, image_size, image_size))

            def blend_g(g, outs):
                rends_, raws_, invds_ = outs
                t_ = jax.lax.dynamic_slice(
                    tbl, (g, 0, 0), (1,) + shapes.table.shape)[0]
                o_ = jax.lax.dynamic_slice(
                    od, (g, 0), (1,) + shapes.order.shape)[0]
                r_ = jax.lax.dynamic_slice(
                    rg, (g, 0), (1,) + shapes.ranges.shape)[0]
                color, invd = rasterize_blend(
                    RasterPrep(t_, o_, r_, None), bg, image_size,
                    image_size, st, channels_first=False)
                img = refine(color[None])[0]
                rends_ = jax.lax.dynamic_update_slice(
                    rends_, jnp.clip(img, 0, 1)[None], (g, 0, 0, 0))
                raws_ = jax.lax.dynamic_update_slice(
                    raws_, jnp.clip(color[:, :, :3], 0, 1)[None],
                    (g, 0, 0, 0))
                invds_ = jax.lax.dynamic_update_slice(
                    invds_, invd[:, :, 0][None], (g, 0, 0))
                return rends_, raws_, invds_

            return jax.lax.fori_loop(0, group, blend_g, (rends, raws, invds))

        self._infer = jax.jit(infer_impl)
        self._frame = jax.jit(frame_impl)
        self._planned_frame_impl = planned_frame_impl
        self._grouped_frames_impl = grouped_frames_impl
        self._grouped_fns: dict = {}
        self._planned_frames: dict = {}
        # windowed MXU deformer gather (ops/facegather.py): the XLA row
        # gather it replaces is ~20 ns/row on TPU; interpret mode off-TPU
        # would be slower than the gather, so the plan is TPU-only
        self._use_plan = jax.default_backend() == "tpu"
        self._active_plan = None
        self._active_cfaces = None

    def infer_avatar(self, source: dict, prune: bool = True):
        """One-shot avatar from a source record (ref: test.py:38-56)."""
        avatar, extra = self._infer(
            self.params["inferer"],
            self._ehm_arrays,
            self._tables,
            jnp.asarray(source["image"])[None],
            jnp.asarray(source["w2c"])[None],
            _batched_params(source["params"]),
        )
        if prune:
            avatar = prune_avatar(
                avatar, float(self.rt.cfg.MODEL.get("opacity_threshold", 0.001))
            )
        self._active_plan = self._active_cfaces = None
        n_uv = avatar.uv_local_xyz.shape[1]
        if self._use_plan and prune and n_uv % 256 == 0:
            from ..avatar.deformer import sort_avatar_by_plan
            from ..ops.facegather import build_face_sort_plan, compact_faces

            plan = build_face_sort_plan(
                np.asarray(avatar.uv_binding_face),
                np.asarray(avatar.uv_valid),
            )
            avatar = sort_avatar_by_plan(avatar, plan)  # numpy, post-prune
            self._active_plan = plan
            self._active_cfaces = jnp.asarray(
                compact_faces(plan, np.asarray(self.rt.statics.faces))
            )
        return avatar, extra

    def render_frame(self, avatar, target: dict) -> dict:
        """Deform + rasterize + refine one target record (ref: test.py:70-80)
        as a single device call."""
        plan = self._active_plan
        if plan is not None:
            fn = self._planned_frames.get(id(plan))
            if fn is None:
                import functools

                fn = jax.jit(functools.partial(
                    self._planned_frame_impl, plan, self._active_cfaces
                ))
                self._planned_frames[id(plan)] = fn
        else:
            fn = self._frame
        render, raw, invdepth = fn(
            self.params["renderer"],
            self._ehm_arrays,
            self._tables,
            avatar,
            _batched_params(target["params"]),
            jnp.asarray(target["w2c"]),
        )
        return {"render": render, "raw": raw, "invdepth": invdepth}

    def render_frames(self, avatar, targets: list, group: int) -> list[dict]:
        """Render len(targets) frames through the grouped two-phase program
        (see grouped_frames_impl), G frames per device call. Short final
        chunks replicate the last target; the padded renders are computed
        but not returned."""
        import functools

        if not targets:
            return []
        key = (group, avatar.uv_local_xyz.shape[1],
               id(self._active_plan))
        fn = self._grouped_fns.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                self._grouped_frames_impl, self._active_plan,
                self._active_cfaces, group))
            self._grouped_fns[key] = fn
        outs: list[dict] = []
        for s in range(0, len(targets), group):
            chunk = targets[s:s + group]
            chunk = chunk + [chunk[-1]] * (group - len(chunk))
            tgt = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[_batched_params(t["params"]) for t in chunk])
            w2c = jnp.stack([jnp.asarray(t["w2c"]) for t in chunk])
            rends, raws, invds = fn(
                self.params["renderer"], self._ehm_arrays, self._tables,
                avatar, tgt, w2c)
            n_real = len(targets[s:s + group])
            for g in range(n_real):
                outs.append({"render": rends[g], "raw": raws[g],
                             "invdepth": invds[g]})
        return outs


def infer_avatar(rt: Runtime, params: dict, source: dict, prune: bool = True):
    """Convenience wrapper (one-off; loops should hold a FramePipeline)."""
    return FramePipeline(rt, params).infer_avatar(source, prune=prune)


def render_frame(rt: Runtime, params: dict, avatar, target: dict) -> dict:
    """Convenience wrapper (one-off; loops should hold a FramePipeline)."""
    out = FramePipeline(rt, params).render_frame(avatar, target)
    return {k: np.asarray(v) for k, v in out.items()}


def render_set(
    rt: Runtime,
    params: dict,
    dataset,
    save_path: str,
    saving_name: str = "render",
    max_frames: int | None = None,
    export_ply: bool = True,
    dp_frames: bool = False,
    group_frames: int = 0,
) -> dict:
    """Self-reenactment over the test frames of each video (ref: test.py:30-94).

    dp_frames=True renders frames data-parallel over all local devices
    (one avatar, poses sharded over the mesh — see parallel/batch_render.py);
    the reference can only render sequentially on one GPU.

    group_frames=G>1 renders G frames per device call through the grouped
    two-phase program (FramePipeline.render_frames): higher throughput on
    one chip at G frames of latency."""
    os.makedirs(save_path, exist_ok=True)
    pipe = FramePipeline(rt, params)
    n_dev = len(jax.devices())
    dp_frames = dp_frames and n_dev > 1
    if dp_frames:
        from ..parallel.batch_render import make_batch_frame_renderer, pad_to_multiple
        from ..parallel.mesh import data_parallel_mesh
        from ..train.pipeline import _unpack_params as _unpack

        mesh = data_parallel_mesh(n_dev)
        brend = make_batch_frame_renderer(
            rt.statics.renderer, rt.ehm, rt.statics.faces, _unpack,
            image_size=int(rt.cfg.MODEL.image_size),
            invtanfov=float(rt.cfg.MODEL.invtanfov),
            mesh=mesh,
        )

    by_video: dict[str, list[int]] = {}
    for i, key in enumerate(dataset.frames):
        vid = key.split("/")[0]
        by_video.setdefault(vid, []).append(i)

    results = {}
    for vid, idxs in by_video.items():
        speed = SpeedMeter()
        scene_dir = os.path.join(save_path, vid)
        rdir = os.path.join(scene_dir, saving_name)
        gdir = os.path.join(scene_dir, "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)

        first = dataset[idxs[0]]
        # warm-up (compile) then timed inference (ref: test.py:41-50)
        pipe.infer_avatar(first["source"])
        with speed.time_infer():
            avatar, _ = pipe.infer_avatar(first["source"])
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
        if dp_frames and sel:
            recs = [dataset[i] for i in sel]
            tgt_params = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[_batched_params(r["target"]["params"]) for r in recs],
            )
            # _batched_params adds the per-record batch dim; drop it post-stack
            tgt_params = {k: v[:, 0] for k, v in tgt_params.items()}
            w2c = jnp.stack([jnp.asarray(r["target"]["w2c"]) for r in recs])
            (tgt_params, w2c), n_real = pad_to_multiple((tgt_params, w2c), n_dev)
            brend(pipe.params["renderer"], avatar, tgt_params, w2c)  # warm-up/compile
            import time as _time

            t0 = _time.time()
            renders, _raws = brend(pipe.params["renderer"], avatar, tgt_params, w2c)
            jax.block_until_ready(renders)
            speed.add_frames(len(sel), _time.time() - t0)
            for j, (i, rec) in enumerate(zip(sel, recs)):
                name = f"{i:06d}.png"
                gt = np.asarray(rec["target"]["image"]) * np.asarray(rec["target"]["mask"])
                render = np.asarray(renders[j])
                _save_png(os.path.join(gdir, name), gt)
                _save_png(os.path.join(rdir, name), render)
                frames.append(np.concatenate([gt, render], axis=1))
            del n_real  # padding frames are rendered but never saved
        elif group_frames > 1 and sel:
            recs = [dataset[i] for i in sel]
            targets = [r["target"] for r in recs]
            # warm-up (compile) on the first chunk, then timed
            pipe.render_frames(avatar, targets[:group_frames], group_frames)
            import time as _time

            t0 = _time.time()
            outs = pipe.render_frames(avatar, targets, group_frames)
            jax.block_until_ready(outs[-1]["render"])
            speed.add_frames(len(sel), _time.time() - t0)
            for i, rec, out in zip(sel, recs, outs):
                name = f"{i:06d}.png"
                gt = np.asarray(rec["target"]["image"]) * np.asarray(rec["target"]["mask"])
                render = np.asarray(out["render"])
                _save_png(os.path.join(gdir, name), gt)
                _save_png(os.path.join(rdir, name), render)
                frames.append(np.concatenate([gt, render], axis=1))
        else:
            # warm-up the frame trace so the timed loop measures steady state
            if sel:
                pipe.render_frame(avatar, dataset[sel[0]]["target"])
            for i in sel:
                rec = dataset[i]
                with speed.time_frame():
                    out = pipe.render_frame(avatar, rec["target"])
                    jax.block_until_ready(out["render"])
                name = f"{i:06d}.png"
                gt = np.asarray(rec["target"]["image"]) * np.asarray(rec["target"]["mask"])
                render = np.asarray(out["render"])
                _save_png(os.path.join(gdir, name), gt)
                _save_png(os.path.join(rdir, name), render)
                frames.append(np.concatenate([gt, render], axis=1))
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
    """Cross-reenactment (ref: main/test.py:96-139). Emits speed_info.json
    like the self-reenactment path (ref: main/test.py:90-94)."""
    os.makedirs(save_path, exist_ok=True)
    pipe = FramePipeline(rt, params)
    speed = SpeedMeter()
    src = source_dataset[0]
    pipe.infer_avatar(src["source"])  # warm-up (compile)
    with speed.time_infer():
        avatar, _ = pipe.infer_avatar(src["source"])
        jax.block_until_ready(avatar.uv_colors)
    frames = []
    n = len(target_dataset) if max_frames is None else min(max_frames, len(target_dataset))
    for i in range(n):
        rec = target_dataset[i]
        tgt = dict(rec["target"])
        tgt["params"] = change_id_info(tgt["params"], src["source"]["params"])
        if keep_source_cam:
            tgt["w2c"] = src["source"]["w2c"]
        with speed.time_frame():
            out = pipe.render_frame(avatar, tgt)
            jax.block_until_ready(out["render"])
        render = np.asarray(out["render"])
        _save_png(os.path.join(save_path, f"{i:06d}.png"), render)
        frames.append(render)
    _write_video(os.path.join(save_path, "cross_reenact.mp4"), frames)
    speed.dump(os.path.join(save_path, "speed_info.json"))


def render_novel_views(
    rt: Runtime,
    params: dict,
    dataset,
    save_path: str,
    static: bool = False,
    frame_idx: int = 0,
    num_keyframes: int = 120,
) -> None:
    """Orbit renders, static pose or animated (ref: main/test.py:141-216).
    Emits speed_info.json like the reference (ref: main/test.py:90-94)."""
    os.makedirs(save_path, exist_ok=True)
    pipe = FramePipeline(rt, params)
    speed = SpeedMeter()
    first = dataset[frame_idx]
    pipe.infer_avatar(first["source"])  # warm-up (compile)
    with speed.time_infer():
        avatar, _ = pipe.infer_avatar(first["source"])
        jax.block_until_ready(avatar.uv_colors)
    c2w = np.linalg.inv(np.asarray(first["target"]["w2c"]))
    poses = generate_novel_view_poses(c2w, num_keyframes=num_keyframes)
    frames = []
    for i, w2c in enumerate(poses):
        rec = first if static else dataset[min(i, len(dataset) - 1)]
        tgt = dict(rec["target"])
        tgt["w2c"] = w2c
        with speed.time_frame():
            out = pipe.render_frame(avatar, tgt)
            jax.block_until_ready(out["render"])
        render = np.asarray(out["render"])
        _save_png(os.path.join(save_path, f"{i:06d}.png"), render)
        frames.append(render)
    _write_video(os.path.join(save_path, "novel_views.mp4"), frames)
    speed.dump(os.path.join(save_path, "speed_info.json"))
