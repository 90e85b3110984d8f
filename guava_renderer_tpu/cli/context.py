"""Runtime assembly: config -> assets -> EHM -> models -> pipeline statics.

The glue the reference spreads across main/train.py:17-60 and
main/test.py:219-260 — built once, shared by every entry point.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..avatar.inferer import InfererConfig, UbodyGaussianInferer
from ..avatar.renderer import GaussianRenderer
from ..bodymodel import load_flame, load_smplx, synthetic_ehm
from ..bodymodel.ehm import BodyParams, EhmModel, FlameParams
from ..ops.gsplat import RasterizeSettings
from ..train.losses import LossConfig
from ..train.lpips import LPIPS
from ..train.pipeline import PipelineStatics
from ..utils.config import ConfigDict, load_config


@dataclass
class Runtime:
    cfg: ConfigDict
    smplx: Any
    flame: Any
    extras: Any
    ehm: EhmModel
    statics: PipelineStatics
    num_vertices: int

    @property
    def inferer(self) -> UbodyGaussianInferer:
        return self.statics.inferer

    @property
    def renderer(self) -> GaussianRenderer:
        return self.statics.renderer


def resolve_config(config_name: str) -> ConfigDict:
    """Accept a config name (configs/train/<name>.yaml), a yaml path, or a
    model dir containing config.yaml (ref: main/test.py:230-241)."""
    candidates = [
        config_name,
        os.path.join("configs", "train", f"{config_name}.yaml"),
        os.path.join(config_name, "config.yaml"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return load_config(c)
    raise FileNotFoundError(f"no config found for {config_name!r}; tried {candidates}")


def build_runtime(cfg: ConfigDict, synthetic_assets: bool = False) -> Runtime:
    m = cfg.MODEL
    if synthetic_assets or not os.path.exists(
        os.path.join(m.smplx_assets_dir, "SMPLX_NEUTRAL_2020.npz")
    ):
        if not synthetic_assets:
            print(
                "[context] SMPL-X model files not found — falling back to "
                "synthetic assets (geometry is procedural; download the real "
                "models per the README for production runs)"
            )
        smplx, flame, extras = synthetic_ehm(
            body_side=int(m.get("synthetic_body_side", 64)),
            head_side=int(m.get("synthetic_head_side", 12)),
            uv_size=m.uvmap_size,
            n_shape=int(m.get("synthetic_n_shape", 50)),
            n_exp=int(m.get("synthetic_n_exp", 20)),
            add_teeth=bool(m.get("add_teeth", True)),
        )
    else:
        smplx, extras = load_smplx(
            m.smplx_assets_dir,
            n_shape=300,
            n_exp=50,
            add_teeth=bool(m.get("add_teeth", True)),
            uv_size=m.uvmap_size,
            flame_assets_dir=m.flame_assets_dir,
        )
        flame = load_flame(m.flame_assets_dir, n_shape=300, n_exp=50)

    ehm = EhmModel.build(smplx, flame, extras)

    ru0 = m.get("refiner_type", "styleunet")
    rcfg0 = m.get(ru0, None)
    icfg = InfererConfig(
        image_size=m.image_size,
        uvmap_size=m.uvmap_size,
        invtanfov=float(m.invtanfov),
        dino_out_dim=m.dino_out_dim,
        uv_out_dim=m.uv_out_dim,
        smplx_fea_dim=m.smplx_fea_dim,
        prj_out_dim=m.prj_out_dim,
        global_vertex_dim=m.global_vertex_dim,
        color_dim=m.color_dim,
        uv_base_dim=int(m.get("uv_base_dim", 32)),
        style_dim=int(rcfg0.get("num_style_feat", 512)) if rcfg0 else 512,
        num_mlp=int(rcfg0.get("num_mlp", 8)) if rcfg0 else 8,
        channel_scale=float(rcfg0.get("channel_scale", 1)) if rcfg0 else 1.0,
        # optional backbone shrink knobs (CI/smoke configs; default ViT-B/14)
        vit_dim=int(m.get("vit_dim", 768)),
        vit_depth=int(m.get("vit_depth", 12)),
        vit_heads=int(m.get("vit_heads", 12)),
        pyramid_dims=tuple(m.get("pyramid_dims", (256, 512, 1024, 1024))),
    )
    raster_cfg = m.get("raster", None) or {}
    settings = RasterizeSettings(
        tile=raster_cfg.get("tile", 16),
        chunk=raster_cfg.get("chunk", 32),
        max_tiles_per_gaussian=raster_cfg.get("max_tiles_per_gaussian", 8),
        large_k=raster_cfg.get("large_k", 0),
        tpg_large=raster_cfg.get("tpg_large", 64),
        instance_budget=raster_cfg.get("instance_budget", None),
        dma_banks=raster_cfg.get("dma_banks", 1),
        presort=bool(raster_cfg.get("presort", True)),
        tile_cull=bool(raster_cfg.get("tile_cull", True)),
        # multi-class cap ladder: [[count, cap], ...] by descending area
        size_classes=tuple(
            (int(c), int(k)) for c, k in raster_cfg.get("size_classes", ())
        ),
        vmem_classes=int(raster_cfg.get("vmem_classes", 0)),
        streaming=bool(raster_cfg.get("streaming", False)),
        priority_window=int(raster_cfg.get("priority_window", 16)),
        bf16_rows=bool(raster_cfg.get("bf16_rows", False)),
    )
    banks = int(raster_cfg.get("dma_banks", 1))
    assert int(raster_cfg.get("chunk", 32)) % max(banks, 1) == 0, (
        "raster.dma_banks must divide raster.chunk: the blend kernel's "
        "byte-counted DMA waits absorb chunk//banks rows per bank"
    )
    inferer = UbodyGaussianInferer(cfg=icfg, num_vertices=smplx.num_vertices)
    ru = m.get("refiner_type", "styleunet")
    rcfg = m.get(ru, None)
    renderer = GaussianRenderer(
        refiner_type=ru,
        image_size=m.image_size,
        channel_scale=float(rcfg.get("channel_scale", 1)) if rcfg else 1.0,
        small=bool(rcfg.get("small", True)) if rcfg else True,
        style_dim=int(rcfg.get("num_style_feat", 512)) if rcfg else 512,
        num_mlp=int(rcfg.get("num_mlp", 8)) if rcfg else 8,
        settings=settings,
        # refiner trained at styleunet.out_size; differs from image_size in
        # multi-res render_motion (--image_size 720/1080/2048)
        refiner_size=int(rcfg.get("out_size", m.image_size)) if rcfg else None,
        # serving lever (MODEL.bf16_refiner / CLI --bf16): refiner compute in
        # bfloat16, rasterizer stays f32
        refiner_dtype=jnp.bfloat16 if bool(m.get("bf16_refiner", False)) else None,
    )

    opt = cfg.OPTIMIZE
    loss_cfg = LossConfig(
        lambda_l1=float(opt.lambda_l1),
        lambda_perpetual=float(opt.lambda_perpetual),
        lambda_perpetual_high=float(opt.lambda_perpetual_high),
        perpetual_increase_iter=int(opt.perpetual_increase_iter),
        lambda_head_crop=float(opt.lambda_head_crop),
        lambda_hand_crop=float(opt.lambda_hand_crop),
        lambda_local_xyz=float(opt.lambda_local_xyz),
        lambda_local_scale=float(opt.lambda_local_scale),
        threshold_local_xyz=float(opt.threshold_local_xyz),
        threshold_scale=float(opt.threshold_scale),
        # first-N-iters masked-render window (ref: loss_utils.py:101-102);
        # overridable for short overfit/convergence runs
        mask_renders_until=int(opt.get("mask_renders_until", 1000)),
        crop_size=int(opt.get("crop_size", 256)),
    )

    statics = PipelineStatics(
        ehm=ehm,
        faces=jnp.asarray(smplx.faces),
        uvmap_f_idx=jnp.asarray(extras.uvmap_f_idx),
        uvmap_f_bary=jnp.asarray(extras.uvmap_f_bary),
        uvmap_mask=jnp.asarray(extras.uvmap_mask),
        inferer=inferer,
        renderer=renderer,
        lpips=LPIPS(net_type="alex"),
        loss_cfg=loss_cfg,
        image_size=m.image_size,
        invtanfov=float(m.invtanfov),
    )
    return Runtime(
        cfg=cfg, smplx=smplx, flame=flame, extras=extras, ehm=ehm,
        statics=statics, num_vertices=smplx.num_vertices,
    )


def init_params(rt: Runtime, seed: int = 0, feature_img_size: int | None = None) -> dict:
    """Initialize inferer + renderer + lpips parameters."""
    m = rt.cfg.MODEL
    B = 1
    fsize = feature_img_size or m.feature_img_size
    key = jax.random.PRNGKey(seed)
    img = jnp.zeros((B, fsize, fsize, 3))
    w2c = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    U = m.uvmap_size
    inf = rt.inferer.init(
        key, img, w2c,
        jnp.zeros((B, rt.num_vertices, 3)),
        jnp.zeros((B, U, U)),
        rt.statics.uvmap_f_idx,
        rt.statics.uvmap_f_bary,
        rt.statics.faces,
    )["params"]

    from ..avatar.state import GaussianSet
    from ..core.cameras import Camera

    tanfov = 1.0 / float(m.invtanfov)
    gs = GaussianSet(
        xyz=jnp.zeros((B, 16, 3)),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 16, 1)),
        scaling=jnp.full((B, 16, 3), 0.01),
        opacity=jnp.full((B, 16, 1), 0.5),
        colors=jnp.zeros((B, 16, 32)),
    )
    cam = Camera(
        R=jnp.eye(3), t=jnp.asarray([0.0, 0.0, 10.0]),
        tanfovx=jnp.asarray(tanfov), tanfovy=jnp.asarray(tanfov),
        width=m.image_size, height=m.image_size,
    )
    rend = rt.renderer.init(key, gs, [cam])["params"]
    x0 = jnp.zeros((1, m.image_size, m.image_size, 3))
    lp = rt.statics.lpips.init(key, x0, x0)["params"]
    params = {"model": {"inferer": inf, "renderer": rend}, "lpips": lp}
    return load_pretrained_backbones(rt, params)


def load_pretrained_backbones(rt: Runtime, params: dict,
                              pretrained_dir: str | None = None) -> dict:
    """Overlay converted pretrained weights when their msgpacks exist.

    The reference trains with a frozen torch-hub DINOv2
    (ref: ubody_gaussian.py:37-38) and an LPIPS-alex perceptual loss with
    torchvision weights (ref: loss_utils.py:79). Offline, those arrive via
    tools/convert_weights.py into MODEL.pretrained_dir
    (default assets/pretrained/):
        dinov2_vitb14.msgpack  -> inferer.dino_encoder.dino
        lpips_alex.msgpack     -> the LPIPS tree
    Missing files are skipped with a notice (random backbone)."""
    import os as _os

    from flax.serialization import msgpack_restore

    from ..train.weights import merge_params

    d = pretrained_dir or str(rt.cfg.MODEL.get("pretrained_dir", "assets/pretrained"))
    dino_path = _os.path.join(d, "dinov2_vitb14.msgpack")
    if _os.path.isfile(dino_path):
        with open(dino_path, "rb") as f:
            tree = msgpack_restore(f.read())
        enc = params["model"]["inferer"]["dino_encoder"]
        enc["dino"] = merge_params(enc["dino"], tree, require_all=True)
        print(f"[context] loaded pretrained DINOv2 from {dino_path}")
    else:
        print(f"[context] no pretrained DINOv2 at {dino_path} — random backbone")
    lpips_path = _os.path.join(d, "lpips_alex.msgpack")
    if _os.path.isfile(lpips_path):
        with open(lpips_path, "rb") as f:
            tree = msgpack_restore(f.read())
        params["lpips"] = merge_params(params["lpips"], tree, require_all=True)
        print(f"[context] loaded pretrained LPIPS from {lpips_path}")
    return params


def load_model_params(rt: Runtime, model_path: str | None, basemodel: str | None = None,
                      allow_random: bool = False) -> tuple[dict, str]:
    """Weight discovery shared by test/render_motion/app (ref: main/test.py:242-252
    best*/latest* + find_pt_file, utils/general_utils.py:310-314).

    Order: explicit --basemodel > Orbax checkpoints under <model_path>/checkpoints
    > converted reference weights <model_path>/converted_params.msgpack.
    Random init requires allow_random (the reference hard-requires weights)."""
    import jax.numpy as jnp

    from ..train.checkpoints import CheckpointManager
    from ..train.trainstep import TrainState, make_optimizer
    from ..train.weights import load_converted_params

    params = init_params(rt)["model"]

    def template():
        return TrainState(params, make_optimizer(params).init(params), jnp.asarray(0))

    if basemodel:
        cm = CheckpointManager(os.path.dirname(os.path.dirname(basemodel)) or ".")
        restored, it = cm.restore(template(), basemodel)
        return restored.params, f"{basemodel} @ iter {it}"

    if model_path:
        if os.path.isdir(os.path.join(model_path, "checkpoints")):
            cm = CheckpointManager(model_path)
            found = cm.find_checkpoint()
            if found:
                restored, it = cm.restore(template())
                return restored.params, f"{found} @ iter {it}"
        converted = os.path.join(model_path, "converted_params.msgpack")
        if os.path.isfile(converted):
            params = load_converted_params(converted, params)
            return params, f"converted reference weights {converted}"

    if not allow_random:
        raise SystemExit(
            f"no trained weights found under {model_path!r} — the reference "
            "requires a trained checkpoint (best_*.pt). Pass "
            "--allow_random_weights for random init (debug only), or convert "
            "the released checkpoint with tools/convert_guava_checkpoint.py."
        )
    print("[context] RANDOM WEIGHTS (explicitly allowed)")
    return params, "random initialization"


def camera_from_w2c(rt: Runtime, w2c: np.ndarray):
    from ..core.cameras import Camera

    tanfov = 1.0 / float(rt.cfg.MODEL.invtanfov)
    return Camera(
        R=jnp.asarray(w2c[:3, :3]),
        t=jnp.asarray(w2c[:3, 3]),
        tanfovx=jnp.asarray(tanfov, jnp.float32),
        tanfovy=jnp.asarray(tanfov, jnp.float32),
        width=rt.cfg.MODEL.image_size,
        height=rt.cfg.MODEL.image_size,
    )


def batch_params_to_body_flame(params: dict) -> tuple[BodyParams, FlameParams]:
    from ..train.pipeline import _unpack_params

    return _unpack_params(params)
