"""Self-consistent "teacher" dataset for convergence evidence.

Writes a synthetic tracked dataset (bodymodel/synthetic rig motion), then
REPLACES its placeholder images with renders of a fixed procedural teacher
avatar produced by this framework's own pipeline at every tracked pose.
The resulting pose->image mapping is exactly representable by the model
family, so a training run that generalizes to the held-out validation
frames (new poses, same identities) demonstrates the full loss/optimizer
pipeline learning — not memorizing (VERDICT r2 item 3b).

The teacher avatar is built by running the real inferer once (for the
binding tables / static shapes) and then overriding appearance with smooth
deterministic fields: RGB = sinusoids of canonical position (per-video
phase so identities differ), high opacity, edge-length-scaled splats.

Usage:
  python tools/make_teacher_dataset.py --out /tmp/guava_teacher_ds \
      -c configs/train/teacher128_synthetic.yaml --videos 2 --frames 16 \
      --platform cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/guava_teacher_ds")
    ap.add_argument("-c", "--config", default="configs/train/teacher128_synthetic.yaml")
    ap.add_argument("--videos", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(args.platform or "cpu")

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from guava_renderer_tpu.cli.context import build_runtime, init_params, resolve_config
    from guava_renderer_tpu.cli.inference import FramePipeline
    from guava_renderer_tpu.data.store import RecordStoreWriter
    from guava_renderer_tpu.data.synthetic import write_synthetic_dataset
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset

    cfg = resolve_config(args.config)
    m = cfg.MODEL

    write_synthetic_dataset(
        args.out,
        n_videos=args.videos,
        n_frames=args.frames,
        image_size=int(cfg.DATASET.origin_image_size),
        n_shape=int(m.synthetic_n_shape),
        n_exp=int(m.synthetic_n_exp),
        seed=args.seed,
        image_mode="smooth",
    )
    print(f"[teacher] wrote motion skeleton: {args.videos} videos x {args.frames} frames")

    rt = build_runtime(cfg, synthetic_assets=True)
    params = init_params(rt, seed=args.seed)["model"]
    pipe = FramePipeline(rt, params)

    ds = TrackedVideoDataset(
        args.out, "test",
        image_size=int(m.image_size),
        feature_img_size=int(m.feature_img_size),
        origin_image_size=int(cfg.DATASET.origin_image_size),
    )

    faces = np.asarray(rt.statics.faces)

    def teacher_avatar(avatar, phase: float):
        """Override appearance with smooth deterministic fields."""
        vtx = np.asarray(avatar.vtx_positions)          # (1, V, 3)
        # mean edge length sets a splat scale that tiles the surface
        tri = vtx[0][faces]                             # (F, 3, 3)
        e = np.linalg.norm(tri[:, 1] - tri[:, 0], axis=-1)
        s0 = float(np.mean(e))

        def rgb_of(pos):
            x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
            freq = 6.0
            return np.stack([
                0.5 + 0.45 * np.sin(freq * x + phase),
                0.5 + 0.45 * np.sin(freq * y + 2.1 + phase),
                0.5 + 0.45 * np.sin(freq * z + 4.2 + phase),
            ], axis=-1).astype(np.float32)

        V = vtx.shape[1]
        vtx_colors = np.zeros((1, V, 32), np.float32)
        vtx_colors[..., :3] = rgb_of(vtx)
        N = avatar.uv_local_xyz.shape[1]
        uv_valid = np.asarray(avatar.uv_valid, bool)
        # uv gaussians sit on their binding faces: color by face centroid
        fctr = tri.mean(axis=1)                         # (F, 3)
        uv_pos = fctr[np.asarray(avatar.uv_binding_face)]
        uv_colors = np.zeros((1, N, 32), np.float32)
        uv_colors[..., :3] = rgb_of(uv_pos)[None]

        ident = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (1, V, 1))
        identu = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (1, N, 1))
        return avatar._replace(
            vtx_colors=jnp.asarray(vtx_colors),
            vtx_opacity=jnp.full((1, V, 1), 0.92),
            vtx_scales=jnp.full((1, V, 3), 0.6 * s0),
            vtx_rotations=jnp.asarray(ident),
            uv_colors=jnp.asarray(uv_colors),
            uv_opacity=jnp.asarray(
                (0.92 * uv_valid[None, :, None]).astype(np.float32)
            ),
            uv_scales=jnp.full((1, N, 3), 0.5 * s0),
            uv_rotations=jnp.asarray(identu),
            uv_local_xyz=jnp.zeros((1, N, 3)),
        )

    # render every frame of every video with its per-video teacher
    renders: dict[str, bytes] = {}
    for vi, (vid, info) in enumerate(sorted(ds.videos_info.items())):
        keys = info["frames_keys"]
        src = ds._load_info(vid, keys[0])
        source = {
            "image": src["image"] * src["mask"][..., None]
            if src["mask"].ndim == 2 else src["image"] * src["mask"],
            "w2c": src["w2c"],
            "params": src,
        }
        # resize source to feature size the way the loader does
        from guava_renderer_tpu.data.tracked import _resize
        source["image"] = _resize(source["image"], int(m.feature_img_size))
        avatar, _ = pipe.infer_avatar(source, prune=False)
        avatar = teacher_avatar(avatar, phase=2.39996 * vi)

        for fk in keys:
            rec = ds._load_info(vid, fk)
            out = pipe.render_frame(avatar, {"params": rec, "w2c": rec["w2c"]})
            img = np.asarray(out["raw"])
            mask = (np.asarray(out["invdepth"]) > 1e-8).astype(np.uint8) * 255
            img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ok1, img_jpg = cv2.imencode(
                ".jpg", cv2.cvtColor(img8, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 98],
            )
            ok2, mask_png = cv2.imencode(".png", mask)
            assert ok1 and ok2
            renders[f"{vid}/{fk}/body_image"] = img_jpg.tobytes()
            renders[f"{vid}/{fk}/body_mask"] = mask_png.tobytes()
            cov = float((mask > 0).mean())
            print(f"[teacher] {vid}/{fk}: coverage={cov:.2%}", flush=True)

    # rewrite the store with teacher renders
    store_path = os.path.join(args.out, "img_store.grv")
    os.remove(store_path)
    writer = RecordStoreWriter(store_path)
    for k, v in renders.items():
        writer.put(k, v)
    writer.close()
    print(f"[teacher] rewrote {store_path} with {len(renders)} records")


if __name__ == "__main__":
    main()
